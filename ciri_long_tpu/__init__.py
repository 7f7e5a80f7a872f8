"""CIRI-long-TPU: a TPU-native circular RNA identification framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of CIRI-long
(bioinfo-biols/CIRI-long, Zhang et al., Nat Biotech 2021): detection of
circRNA back-splice junctions from Nanopore long reads, cyclic consensus
calling, splice-signal correction, isoform collapse, and expression
quantification -- with all performance-critical inner loops (striped
Smith-Waterman, edit distance, partial-order alignment, tandem-repeat
detection, seed-chain-extend alignment) expressed as batched, fixed-shape
TPU programs instead of per-read CPU calls into C/C++/Rust libraries.

Layout (see SURVEY.md for the reference layer map this covers):
  ops/       batched device kernels (Pallas + jittable JAX)
  models/    aligner / scoring model objects built on ops
  io/        FASTA/FASTQ streaming, 2-bit genome encoding, format writers
  annot/     GTF/bed parsing, splice-site indices, signal search
  pipeline/  call (ccs -> bsj) and collapse stages
  parallel/  device mesh, shard_map batch runners, multi-host DP
  cli/       CIRI-long compatible command line
"""

from ciri_long_tpu.version import __version__

__all__ = ["__version__"]
