from .predict import F0Predictor, load_model, latest_checkpoint

__all__ = ["F0Predictor", "load_model", "latest_checkpoint"]
