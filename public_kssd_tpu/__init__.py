"""public_kssd_tpu — a TPU-native k-mer substring-space sketching framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of Kssd
(k-mer substring space sampling/shuffling decomposition; Yi et al.,
Genome Biology 22:84, 2021; reference C implementation at
yhg926/public_kssd):

  * genome/read sketching by deterministic k-mer substring-space sampling
  * sketch resemblance (Jaccard / Mash distance) and containment
    (Containment / AAF distance) estimation with CIs, p-values and FDR
  * sketch set algebra (union / intersection / subtraction / grouping)
  * sketch -> k-mer reversal
  * metagenomic composition (abundance) analysis

Architecture (TPU-first, not a port):

  host (python / C helpers)          device (jax / pallas)
  ---------------------------        ----------------------------------
  fasta/fastq streaming + 2-bit  ->  windowed k-mer extraction,
  packing, file formats,             canonicalization, shuffled-space
  byte-exact artifact codecs         filtering, drtuple repacking
                                     (ops.sketch, ops.pallas_sketch)
  CSR index artifacts            ->  shared-k-mer counting as batched
                                     gather/segment ops (ops.count)
  exact float64 stats + printf   <-  count matrices
  formatting (ops.stats)
  multi-host orchestration       ->  shard_map over jax.sharding.Mesh,
  (parallel.*)                       psum-merged partial counts

All on-disk artifacts (.shuf, cofiles.stat, combco.*, combco.index.*,
mco.*, mco.index.*, mcofiles.stat, pan.*, .abv ...) are byte-compatible
with the reference implementation so users can switch tools mid-pipeline.

The 64-bit k-mer bit arithmetic requires jax x64 mode, enabled on import.
"""

import os as _os

import jax

jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: XLA compiles through a remote-TPU tunnel
# run tens of seconds each; cache them across processes (tests, CLI runs,
# bench) unless the user already picked a cache dir.
if not _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    jax.config.update(
        "jax_compilation_cache_dir",
        _os.path.join(
            _os.path.expanduser("~"), ".cache", "kssd_tpu_jax_cache"
        ),
    )
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from public_kssd_tpu.config import SketchParams  # noqa: E402

__version__ = "0.1.0"
__all__ = ["SketchParams", "__version__"]
