from openpose_plus_tpu.models.registry import get_model, model_names

__all__ = ["get_model", "model_names"]
