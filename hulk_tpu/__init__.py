"""hulk_tpu — a TPU-native histosketching framework.

A from-scratch JAX/XLA/Pallas implementation with the capabilities of
will-rowe/hulk (reference layout documented in SURVEY.md): streaming FASTQ ->
minimizers -> k-mer spectrum -> histosketch (CWS/weighted MinHash), plus
pairwise distance matrices, KMV/KHF/HyperMinHash sketch variants and an
LSH-Forest index — designed for single-chip through multi-host TPU meshes.
"""

from hulk_tpu.version import FRAMEWORK_VERSION, HULK_COMPAT_VERSION

__version__ = FRAMEWORK_VERSION
__all__ = ["FRAMEWORK_VERSION", "HULK_COMPAT_VERSION"]
