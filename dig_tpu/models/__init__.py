from dig_tpu.models import registry
from dig_tpu.models.registry import create_model, register_model, list_models
