"""End-to-end pipeline compositions (the reference's FeatureReader corpus
path, SURVEY §3.2, re-expressed as streaming Dataset pipelines)."""
