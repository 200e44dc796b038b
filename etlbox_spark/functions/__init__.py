from .hashing import bucket_expr, content_sha256, key_hash, salted_key

__all__ = ["bucket_expr", "content_sha256", "key_hash", "salted_key"]
