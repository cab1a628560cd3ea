"""Data layer: ScanNet/ScanRefer pipelines, vocabulary, synthetic scenes."""
