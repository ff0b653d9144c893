from dorado_tpu.alignment.index import ReferenceIndex
from dorado_tpu.alignment.mapper import Alignment, Mapper

__all__ = ["ReferenceIndex", "Mapper", "Alignment"]
