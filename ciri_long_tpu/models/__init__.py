from ciri_long_tpu.models.aligner import GenomeAligner
from ciri_long_tpu.models.hits import Hit, SubHit, get_primary_alignment, remove_long_insert

__all__ = ["GenomeAligner", "Hit", "SubHit", "get_primary_alignment",
           "remove_long_insert"]
