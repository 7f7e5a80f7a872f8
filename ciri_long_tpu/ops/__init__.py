from ciri_long_tpu.ops.sw import sw_score_ends, sw_align_batch, SWParams
from ciri_long_tpu.ops.edit import edit_distance_batch, edit_distance
from ciri_long_tpu.ops.traceback import sw_traceback, banded_global_cigar

__all__ = [
    "sw_score_ends", "sw_align_batch", "SWParams",
    "edit_distance_batch", "edit_distance",
    "sw_traceback", "banded_global_cigar",
]
