"""End-to-end Ray Data pipelines: index build, incremental update, rescore."""
