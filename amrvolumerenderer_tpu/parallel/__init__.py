"""Multi-device mesh parallelism: sharded rendering and compositing."""
