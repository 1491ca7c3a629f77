"""LLM-data-pipeline operators, each designed for 100 TB scale:

* ``dedup``      -- exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding;
  connected components (min-label propagation + large-star/small-star)
* ``similarity`` -- brute-force / LSH-bucketed / IVF cosine top-k; int8
  embedding quantization
* ``text``       -- fingerprints, token stats, quality scores, language ID,
  sequence packing into context bins
* ``multimodal`` -- opaque binary columns with typed metadata + feature stubs
* ``sampling``  -- stratified / exact-per-stratum / deterministic-split
* ``joins``      -- salted equi-join for key skew, as-of join (merge
  formulation), bucketed range join (interval containment as equi join),
  bloom-filter join (map-side probe pruning)
* ``merge``      -- latest-wins upsert (MERGE-INTO semantics), SCD2 history
* ``graph``      -- PageRank, BFS, label propagation, SSSP, k-core,
  degree-oriented triangle counting (checkpoint-cut fixpoint loops)
* ``quality``    -- declarative constraints, key-skew report, snapshot diff
* ``profile``    -- one-pass table profiling
* ``sketches``   -- deterministic mergeable KMV / explicit-register HLL
* ``bpe``        -- distributed BPE vocabulary induction (corpus reduced to
  Heaps-law-bounded word-freq state; merge rounds never rescan the corpus)
"""

from . import (  # noqa: F401
    bpe,
    dedup,
    graph,
    joins,
    merge,
    multimodal,
    profile,
    quality,
    sampling,
    similarity,
    sketches,
    text,
)
