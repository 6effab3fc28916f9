"""HF snapshot downloader.

Reference: accessory/tools/download.py:19-60 (+ misc.py:619-668 hf://
resolution: rank 0 downloads, others wait). Gated: requires network access
(huggingface_hub); in air-gapped environments point --local_dir at a
pre-populated cache.
"""

from __future__ import annotations

import argparse


def get_args_parser():
    p = argparse.ArgumentParser("download HF snapshot", add_help=False)
    p.add_argument("--repo_id", required=True, type=str)
    p.add_argument("--local_dir", default=None, type=str)
    p.add_argument("--allow_patterns", nargs="*", default=None)
    return p


def download(repo_id: str, local_dir=None, allow_patterns=None) -> str:
    try:
        from huggingface_hub import snapshot_download
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "huggingface_hub not installed / no network; place files manually "
            "under --local_dir") from e
    return snapshot_download(repo_id, local_dir=local_dir,
                             allow_patterns=allow_patterns)


def resolve_hf_path(path: str) -> str:
    """Resolve 'hf://repo/name' to a local snapshot dir (meta.py:125-130)."""
    if not path.startswith("hf://"):
        return path
    return download(path[len("hf://"):])


if __name__ == "__main__":
    a = get_args_parser().parse_args()
    print(download(a.repo_id, a.local_dir, a.allow_patterns))
