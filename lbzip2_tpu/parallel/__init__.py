"""Block scheduling and multi-chip sharding (the reference's
process.c/compress.c pthread pipeline, reborn as mesh data parallelism
plus a host-side pipelined scheduler)."""
