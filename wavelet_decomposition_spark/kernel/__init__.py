"""Pure-numpy numeric kernels. No Spark imports here — these run inside
Arrow pandas UDF workers (broadcast + applyInPandas) or on the driver."""
