"""Image reading: local filesystem or object storage.

Reference: accessory/data/data_reader.py:6-23 (local or s3:// ceph via
petrel). The petrel client is datacenter-specific; s3 paths raise a clear
error unless a client is injected.
"""

from __future__ import annotations

from io import BytesIO
from typing import Optional

from PIL import Image

_S3_CLIENT = None


def set_s3_client(client) -> None:
    """Inject an object-store client with a ``get(path) -> bytes`` method."""
    global _S3_CLIENT
    _S3_CLIENT = client


def read_img_general(img_path: str) -> Image.Image:
    if img_path.startswith("s3://"):
        if _S3_CLIENT is None:
            raise RuntimeError(
                "s3:// path but no object-store client configured; call "
                "accessory_tpu.data.data_reader.set_s3_client(...) first")
        return Image.open(BytesIO(_S3_CLIENT.get(img_path))).convert("RGB")
    return Image.open(img_path).convert("RGB")
