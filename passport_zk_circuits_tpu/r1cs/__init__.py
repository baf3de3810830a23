"""R1CS constraint systems + batched satisfaction checking."""
