"""Training-data-pipeline operators (SURVEY.md §4.3.5 north star).

Beyond the reference's capability surface: the operations a large-scale
LLM training-data pipeline needs, built Spark-first on the
``documents`` / ``embeddings`` tables:

- ``text_stats``   — quality scoring, token counting, language ID,
                     document fingerprinting.
- ``dedup``        — exact, n-gram Jaccard, MinHash+LSH, SimHash.
- ``similarity``   — brute-force cosine top-k, LSH-bucketed and IVF
                     approximate variants.
- ``multimodal``   — binary-column plumbing (decode/feature UDF shapes
                     over mapInPandas; codecs stubbed, see module doc).
- ``clusters``     — connected components over near-dup pairs
                     (pointer-jumping label propagation), cluster-level
                     dedup.
- ``packing``      — fixed-token-budget sequence packing (concat-and-
                     cut window arithmetic; greedy no-straddle bins).
- ``pii``          — PII detection + redaction (RE2/Java-compatible
                     patterns, single-projection scrub).
- ``sampling``     — deterministic hash sampling: uniform, stratified,
                     train/holdout split (engine- and layout-stable).
- ``decontam``     — benchmark decontamination via distinct word
                     n-gram overlap (broadcast benchmark gram set).
- ``training``     — distributed classifier training (pyspark.ml
                     hashed-BoW logistic regression, weak-label loop).
- ``filters``      — C4 / Gopher heuristic quality rule families
                     (integer-exact flags) + cross-corpus line dedup.
- ``vocab``        — corpus-vocabulary build + OOV-rate scoring (the
                     integer-exact perplexity stand-in).
"""
