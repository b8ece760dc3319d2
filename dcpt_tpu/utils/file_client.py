"""Pluggable byte-store backends (reference: basicsr/utils/file_client.py:22-190).

Disk, LMDB (multi-env via client_keys), and memcached backends.  Like the
reference, the memcached backend requires the optional ``mc`` client library
at construction time and raises ImportError without it (this environment
cannot exercise a live memcached cluster; the surface and failure mode match
file_client.py:22-59 exactly).
"""

from __future__ import annotations

from abc import ABCMeta, abstractmethod


class BaseStorageBackend(metaclass=ABCMeta):
    @abstractmethod
    def get(self, filepath):
        pass


class HardDiskBackend(BaseStorageBackend):
    """Raw filesystem reads (reference: file_client.py:62-75)."""

    def get(self, filepath) -> bytes:
        with open(str(filepath), "rb") as f:
            return f.read()


class MemcachedBackend(BaseStorageBackend):
    """Memcached reads via the pyvision ``mc`` client (reference:
    file_client.py:22-59 — same config surface, same lazy ImportError)."""

    def __init__(self, server_list_cfg, client_cfg, sys_path=None):
        if sys_path is not None:
            import sys

            sys.path.append(sys_path)
        try:
            import mc
        except ImportError as e:
            raise ImportError("Please install memcached to enable MemcachedBackend.") from e

        self.server_list_cfg = server_list_cfg
        self.client_cfg = client_cfg
        self._client = mc.MemcachedClient.GetInstance(self.server_list_cfg, self.client_cfg)
        self._mc_buffer = mc.pyvector()

    def get(self, filepath) -> bytes:
        import mc

        self._client.Get(str(filepath), self._mc_buffer)
        return mc.ConvertBuffer(self._mc_buffer)


class LmdbBackend(BaseStorageBackend):
    """LMDB reads with one readonly env per client key (reference: file_client.py:78-149)."""

    def __init__(self, db_paths, client_keys="default", readonly=True, lock=False, readahead=False, **kwargs):
        try:
            import lmdb
        except ImportError as e:
            raise ImportError("Please install lmdb to enable LmdbBackend.") from e

        if isinstance(client_keys, str):
            client_keys = [client_keys]
        if isinstance(db_paths, list):
            self.db_paths = [str(v) for v in db_paths]
        else:
            self.db_paths = [str(db_paths)]
        assert len(client_keys) == len(self.db_paths), (
            f"client_keys and db_paths should have the same length, but received {len(client_keys)} and {len(self.db_paths)}."
        )
        self._client = {
            client: lmdb.open(path, readonly=readonly, lock=lock, readahead=readahead, **kwargs)
            for client, path in zip(client_keys, self.db_paths)
        }

    def get(self, filepath, client_key="default") -> bytes:
        filepath = str(filepath)
        assert client_key in self._client, f"client_key {client_key} is not in lmdb clients."
        client = self._client[client_key]
        with client.begin(write=False) as txn:
            value_buf = txn.get(filepath.encode("ascii"))
        return value_buf


class FileClient:
    """Dispatch to a storage backend by name (reference: file_client.py:152-190)."""

    _backends = {
        "disk": HardDiskBackend,
        "memcached": MemcachedBackend,
        "lmdb": LmdbBackend,
    }

    def __init__(self, backend="disk", **kwargs):
        if backend not in self._backends:
            raise ValueError(
                f"Backend {backend} is not supported. Currently supported ones are {list(self._backends.keys())}"
            )
        self.backend = backend
        self.client = self._backends[backend](**kwargs)

    def get(self, filepath, client_key="default"):
        if self.backend == "lmdb":
            return self.client.get(filepath, client_key)
        return self.client.get(filepath)
