from . import layers, registry  # noqa: F401
from .registry import create_model, register_model  # noqa: F401
