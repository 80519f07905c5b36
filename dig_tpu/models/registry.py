"""Tiny model registry.

Plays the role the timm registry plays in the reference (models are built
through `timm.models.create_model(name, **kwargs)`; reference:
models/encoder.py:6-20, run_mae_pretraining_moco.py:278-294).  Entries are
plain factory callables returning Flax modules.
"""

from __future__ import annotations

_REGISTRY = {}


def register_model(fn=None, *, name: str = None):
    def wrap(f):
        _REGISTRY[name or f.__name__] = f
        return f

    if fn is not None:
        return wrap(fn)
    return wrap


def create_model(name: str, **kwargs):
    # Importing the model zoo lazily avoids import cycles.
    from dig_tpu.models import vit, moco  # noqa: F401

    if name not in _REGISTRY:
        raise KeyError(f"unknown model '{name}'; known: {sorted(_REGISTRY)}")
    return _REGISTRY[name](**kwargs)


def list_models():
    from dig_tpu.models import vit, moco  # noqa: F401

    return sorted(_REGISTRY)
