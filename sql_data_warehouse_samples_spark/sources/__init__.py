"""Sources package: loaders and external-table readers."""
