"""Ray-Data-native schema + constraint validation engine.

A from-scratch rebuild of the capabilities of
``Fantomas4/Approximate-Anomaly-Detection-in-Data-Streams`` (reference at
``/root/reference``, ~5.3k LoC of single-threaded Java implementing four
sliding-window distance-based outlier detectors) as an idiomatic Ray Data
engine:

* the reference's streaming outlier detectors (MCOD, ApproxMCOD, LSHOD,
  ApproxMCLSHOD — ``/root/reference/src/algorithms/*.java``) are rebuilt as
  per-partition **distribution-drift checks** running inside ``map_batches``
  actor pools (:mod:`.state`, :mod:`.stages.drift`);
* around them sits a full validation engine over Parquet tables of
  source-code repos: column stats, HyperLogLog cardinality, uniqueness,
  referential integrity, plus large-scale training-data ops (dedup families,
  ANN similarity search, text analysis, multimodal stubs);
* everything streams: zero-copy Arrow batches, partial aggregation before
  shuffles, broadcast small sides, per-partition checkpoint manifests.

Nothing here is a port: all Java structures were re-derived from their
observable semantics and re-expressed on ``ray.data.Dataset``.
"""

__version__ = "0.1.0"
