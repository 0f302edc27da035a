"""Implicit-surface fit models (the reference's MLS_SHAPE_* variants,
src/mls.h:49-53): algebraic sphere and plane fits over weighted moments."""

from mlsgpu_tpu.models.sphere import sphere_distance
from mlsgpu_tpu.models.plane import plane_distance

FIT_MODELS = {"sphere": sphere_distance, "plane": plane_distance}

__all__ = ["sphere_distance", "plane_distance", "FIT_MODELS"]
