"""Data layer: geometry, COCO-json indexing, datasets, target samplers, loader."""
