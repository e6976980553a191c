"""secp256k1 ECDSA: native curve arithmetic + in-circuit verification
(reference ecdsa/src/)."""
