"""Data sources: ANN benchmark vector files, multimodal binaries."""
