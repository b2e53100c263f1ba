"""Serving package: batched TPU engine, tiled full-res inference, HTTP API.

Re-exports are lazy (PEP 562): multi-process HTTP workers import
``serve.http_server``/``serve.ipc`` and must stay jax-free (RemoteEngine's
contract, serve/ipc.py) — an eager ``from .engine import ...`` here would
pull jax into every spawned worker at startup.
"""

_EXPORTS = {
    "InferenceEngine": ".engine",
    "TiledInference": ".tiling",
    "DeglareServer": ".http_server",
    "create_server": ".http_server",
}

__all__ = list(_EXPORTS)


def __getattr__(name: str):
    target = _EXPORTS.get(name)
    if target is None:
        raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
    from importlib import import_module

    return getattr(import_module(target, __name__), name)
