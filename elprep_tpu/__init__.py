"""elprep_tpu: a TPU-native (JAX/XLA/Pallas) secondary-analysis engine.

Re-implements the capabilities of ExaScience/elPrep v5.1.3 (single-pass
filter pipeline over SAM/BAM: sorting, duplicate marking, BQSR,
HaplotypeCaller) with a TPU-first architecture:

- reads are parsed into *columnar* record batches (fixed-width device
  columns + ragged host buffers) instead of elPrep's ``[]*Alignment``
  pointer soup (reference: sam/sam-types.go:289-331),
- sorting is a device-side multi-key stable sort over packed int32 keys
  replicating ``CoordinateLess`` (reference: sam/sam-types.go:425-473),
- duplicate marking is a sort-based segmented reduction instead of
  lock-free CAS hash maps (reference: filters/mark-duplicates.go:406-445),
- BQSR covariate tables are dense device arrays merged with all-reduce
  collectives (reference: filters/bqsr.go:180-223),
- PairHMM / Smith-Waterman are batched Pallas kernels
  (reference: filters/pairhmm.go, filters/sw.go),
- elPrep's split/filter/merge mode maps onto a jax.sharding.Mesh
  (reference: cmd/sfm.go:605-907).
"""

__version__ = "0.1.0"

# Program identity, mirroring utils/programinfo.go:22-29 in the reference.
PROGRAM_NAME = "elprep-tpu"
PROGRAM_VERSION = "5.1.3"
