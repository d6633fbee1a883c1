"""Large-scale pipeline operators beyond the reference surface:
deduplication, similarity search, multimodal column processing."""
