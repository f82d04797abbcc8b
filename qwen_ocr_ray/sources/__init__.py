"""Sources: parquet readers, the page-container codec, the synthetic pages generator."""
