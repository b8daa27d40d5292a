"""End-to-end pipelines composed from nlshray.stages."""
