"""Scene/data layer: dataset readers, cameras, scene container, loader."""
