from .material_model import MaterialBins
from .sound_obj import DiffSoundObject, EigenState, build_model

__all__ = ["MaterialBins", "DiffSoundObject", "EigenState", "build_model"]
