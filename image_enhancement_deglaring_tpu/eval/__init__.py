from .harness import evaluate, load_model_for_eval, write_results_file

__all__ = ["evaluate", "load_model_for_eval", "write_results_file"]
