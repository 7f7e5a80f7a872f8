from ciri_long_tpu.utils.seq import (
    encode_seq,
    decode_seq,
    revcomp,
    revcomp_encoded,
    transform_seq,
    get_junc_seq,
    compress_seq,
    pad_encoded,
)
from ciri_long_tpu.utils.misc import (
    check_file,
    check_dir,
    grouper,
    pairwise,
    flatten,
    min_sorted_items,
    tree,
    to_str,
    to_bytes,
)
from ciri_long_tpu.utils.logger import get_logger, ProgressBar

__all__ = [
    "encode_seq", "decode_seq", "revcomp", "revcomp_encoded", "transform_seq",
    "get_junc_seq", "compress_seq", "pad_encoded",
    "check_file", "check_dir", "grouper", "pairwise", "flatten",
    "min_sorted_items", "tree", "to_str", "to_bytes",
    "get_logger", "ProgressBar",
]
