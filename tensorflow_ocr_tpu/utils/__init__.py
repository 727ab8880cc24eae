"""Host-side utilities: image resize, NMS, result writers, profiling."""
