"""passport_zk_circuits_tpu — TPU-native batched ZK-circuit evaluation & witness
generation framework with the capabilities of rarimo/passport-zk-circuits.

A from-scratch JAX/XLA/Pallas re-design (NOT a circom port): BN254 scalar-field
arithmetic, SHA-1/2/3 + Poseidon/Poseidon2 hashing, RSA / RSA-PSS / ECDSA
signature verification over limb-decomposed bignums, sparse-Merkle-tree proofs,
and the RegisterIdentity / QueryIdentity passport-circuit family — all batched
over an `instances` axis and sharded over a TPU mesh.

Reference capability map: /root/reference (rarimo/passport-zk-circuits); see
SURVEY.md for the component inventory this framework mirrors.
"""

__version__ = "0.1.0"
