"""timm model registry shim: `register_model` stores the entrypoint so the
reference's `@register_model`-decorated config functions import cleanly and
can be looked up by name (≙ timm.models.registry semantics as used by
models/encoder.py:6-20 and run_mae_pretraining_moco.py:280)."""

_model_entrypoints = {}


def register_model(fn):
    _model_entrypoints[fn.__name__] = fn
    return fn


def is_model(name):
    return name in _model_entrypoints


def model_entrypoint(name):
    return _model_entrypoints[name]


def create_model(model_name, pretrained=False, **kwargs):
    if model_name not in _model_entrypoints:
        raise RuntimeError(f"Unknown model ({model_name})")
    return _model_entrypoints[model_name](pretrained=pretrained, **kwargs)
