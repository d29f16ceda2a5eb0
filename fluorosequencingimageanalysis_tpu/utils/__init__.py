from .hashing import epoch_to_hash, hash_to_epoch, psfs_filename

__all__ = ["epoch_to_hash", "hash_to_epoch", "psfs_filename"]
