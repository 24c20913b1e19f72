"""Multi-chip / multi-host parallel runtime.

The reference's "distributed" story is contig-group shards run as
separate processes with gob-file reductions (reference: cmd/sfm.go:605-907,
SURVEY §2.9 P8). The TPU-native equivalents here ride the device mesh:

- reads shard data-parallel over the ``dp`` axis (the contig-group
  analog: splitting guarantees mate-pairs stay in one shard, so sort
  and duplicate marking need no cross-shard communication);
- the genome shards over the ``gn`` axis, with an all-gather standing
  in for the reference's per-process mmap of the full genome;
- BQSR covariate tables and duplicate-metrics counters reduce with
  ``psum`` collectives over ICI instead of gob files on disk;
- PairHMM (read, haplotype) pairs shard over ``dp`` — embarrassingly
  parallel, so scaling is linear in chips.
"""

from .mesh import make_mesh
from .pipeline import pairhmm_sharded

__all__ = ["make_mesh", "pairhmm_sharded"]
