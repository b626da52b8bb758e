"""Data layer: prepared-dataset ingest, ray stores, episodic task sampling."""
