from ciri_long_tpu.ops.sw import (SWParams, sw_align_batch, sw_score_ends,
                                  sw_score_ends_auto, sw_window_align)
from ciri_long_tpu.ops.edit import edit_distance, edit_distance_batch
from ciri_long_tpu.ops.traceback import (banded_global_cigar,
                                         splice_junction_align, sw_traceback)
from ciri_long_tpu.ops.poa import poa
from ciri_long_tpu.ops.ccs import center_star_consensus, find_consensus
from ciri_long_tpu.ops.period import lag_profile
from ciri_long_tpu.ops.chain import backtrack_chains, chain_scores_batch

__all__ = [
    "SWParams", "sw_align_batch", "sw_score_ends", "sw_score_ends_auto",
    "sw_window_align",
    "edit_distance", "edit_distance_batch",
    "banded_global_cigar", "splice_junction_align", "sw_traceback",
    "poa", "center_star_consensus", "find_consensus", "lag_profile",
    "backtrack_chains", "chain_scores_batch",
]
