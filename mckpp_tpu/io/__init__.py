"""Host-side I/O: netCDF ingest, diagnostics, restart."""
