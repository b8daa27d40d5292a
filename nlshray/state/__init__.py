"""Cross-stage state: union-find, checkpoint manifests."""
