"""rcspark — a from-scratch PySpark-native crawl frontier + fetch scheduler.

Re-expresses the capabilities of the reference repo ``rcbuild-info/scrape``
(a Scrapy project; see SURVEY.md §0 — the reference mount was empty at build
time, so semantics are anchored to public Scrapy/w3lib module behavior and to
BASELINE.json's north rule) as an idiomatic Spark pipeline:

- ``urlnorm``    URL canonicalization (pure column expressions + Python twin)
- ``xxh``        pure-Python xxhash64, bit-identical to Spark's builtin
- ``codecs``     numpy-only PPM / quantized-PPM image codecs, PSNR, phash
- ``fixtures``   deterministic synthetic web / corpus / robots generators
- ``oracle``     discrete-event reference-semantics crawl simulator
- ``tables``     schema constants + snapshot/manifest IO (Iceberg-shaped)
- ``dedup``      partitioned Bloom URL-seen filter + exact anti-join backstop
- ``robots``     robots.txt gate (longest-prefix match, crawl-delay)
- ``schedule``   politeness budgets + salted per-host window ranking + seq
- ``fetch``      simulated fetch (equi-join vs synthetic web), retries/redirects
- ``parse``      vectorized page parsing (links / caption / image refs)
- ``lineage``    per-partition, per-wave lineage metrics
- ``run``        the BSP wave loop driver (resume-exact checkpointing)
- ``datapipe``   training-data ops: dedup (exact/minhash/simhash/jaccard),
                 similarity search, text analysis, multimodal plumbing
"""

__version__ = "0.1.0"
