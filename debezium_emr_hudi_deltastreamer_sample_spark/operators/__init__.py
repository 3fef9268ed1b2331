"""Engine-level operators not provided verbatim by Spark (SURVEY.md §7.3):
merge/upsert (the Hudi DeltaStreamer semantics), as-of join, top-k helpers,
dedup family, similarity search, text analysis, multimodal plumbing.
All pure DataFrame / pandas-UDF code — no custom Catalyst."""
