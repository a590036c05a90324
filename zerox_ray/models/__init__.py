from zerox_ray.models.base import Completion, ScorerModel, create_model
from zerox_ray.models.mock import DeterministicExtractorModel

__all__ = ["Completion", "ScorerModel", "create_model", "DeterministicExtractorModel"]
