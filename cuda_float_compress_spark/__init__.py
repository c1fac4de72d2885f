"""cuda_float_compress_spark — a from-scratch, PySpark-native per-column
lightweight-compression engine.

Re-expresses the capabilities of the reference GPU float-compression library
(catid/cuda_float_compress, a cleaned-up cuSZp: quantize -> delta -> zigzag ->
bit-plane transpose -> Zstd; see /root/reference/src/cuszplus_f32.cu) as an
idiomatic Spark engine:

* pure-numpy codec kernels (dictionary, RLE, FSST, frame-of-reference +
  bit-pack, delta + zigzag + bit-plane, byte-plane shuffle, Zstd backend)
  with a per-chunk min-size auto-selector,
* vectorized Arrow/pandas UDFs (``mapInArrow`` / ``applyInPandas``) — no
  per-row Python,
* explicit hash/range partitioning with salting for skewed url hosts,
* per-partition compressed blocks + codec manifests + lineage records +
  metrics, checkpoint-resumable,
* bit-identical round-trip guarantees verified per key (byte-identical
  extracted ``text`` per ``url``).

Everything here derives from public knowledge only (Apache Spark / PySpark
APIs, the reference repo's observable behavior, and published compression
papers: FSST, FastPFor/frame-of-reference, cuSZp).
"""

__version__ = "0.1.0"
