"""Benchmark machinery: read simulation, downsampling, throughput harness."""
