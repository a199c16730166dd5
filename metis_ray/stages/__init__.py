from metis_ray.stages.base import PassThrough
from metis_ray.stages.validate import ValidateAndChecksum
from metis_ray.stages.extract import EdgeExtractor, module_key_for_path
from metis_ray.stages.resolve import build_symbol_table, ResolveEdges

__all__ = [
    "PassThrough",
    "ValidateAndChecksum",
    "EdgeExtractor",
    "module_key_for_path",
    "build_symbol_table",
    "ResolveEdges",
]
