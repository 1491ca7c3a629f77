"""LLM-data-pipeline operators, each designed for 100 TB scale:

* ``dedup``      -- exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding
* ``similarity`` -- brute-force / LSH-bucketed / IVF cosine top-k
* ``text``       -- fingerprints, token stats, quality scores, language ID
* ``multimodal`` -- opaque binary columns with typed metadata + feature stubs
* ``sampling``  -- stratified / exact-per-stratum / deterministic-split
* ``joins``      -- salted equi-join for key skew, as-of join (merge
  formulation), bucketed range join (interval containment as equi join)
"""

from . import dedup, joins, multimodal, sampling, similarity, text  # noqa: F401
