from .table import LakeTable
from .transforms import transform_expr

__all__ = ["LakeTable", "transform_expr"]
