from metis_ray.functions.hashing import hash64, sha256_hex, ngram_fingerprint

__all__ = ["hash64", "sha256_hex", "ngram_fingerprint"]
