from .registry import MODELS, ModelSpec, get_model, model_names

__all__ = ["MODELS", "ModelSpec", "get_model", "model_names"]
