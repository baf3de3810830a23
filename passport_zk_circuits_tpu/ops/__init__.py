"""Kernel library: field/bignum arithmetic, hashes, EC, SMT — all batched."""
