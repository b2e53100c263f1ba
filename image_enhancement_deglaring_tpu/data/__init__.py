from .pipeline import list_image_paths, seeded_split, decode_triptych
from .dataset import (GlareRemovalDataset, make_dataloaders,
                      make_eval_loader, DevicePrefetcher)
from .synthetic import generate_synthetic_sd1
from .augment import optimized_augment, heavy_augment

__all__ = [
    "list_image_paths",
    "seeded_split",
    "decode_triptych",
    "GlareRemovalDataset",
    "make_dataloaders",
    "make_eval_loader",
    "DevicePrefetcher",
    "generate_synthetic_sd1",
    "optimized_augment",
    "heavy_augment",
]
