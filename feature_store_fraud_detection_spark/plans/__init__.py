"""End-to-end logical plans: the flagship batch feature pipeline and the
testdata adapters that run it over the driver's synthetic tables."""
