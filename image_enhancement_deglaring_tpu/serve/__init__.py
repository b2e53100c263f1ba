from .engine import InferenceEngine
from .tiling import TiledInference
from .http_server import DeglareServer, create_server

__all__ = ["InferenceEngine", "TiledInference", "DeglareServer", "create_server"]
