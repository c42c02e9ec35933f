"""Optional integrations. Each submodule import-guards its external dependency."""
