"""Corpus-scale processing with a resumable shard manifest.

The reference has no streaming checkpointing — multi-node DeReKo runs
are external job schedulers over files (SURVEY.md §5).  Here a corpus
run writes a JSON manifest recording per-file completion (with output
checksums), so an interrupted run resumes where it stopped — the
shard-progress manifest the TPU build plan calls for.
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile
from typing import Sequence

from .pipeline import tokenize_stream
from .writer import SIMPLE, TokenWriter


def _sha(data: bytes) -> str:
    return hashlib.sha256(data).hexdigest()[:16]


class CorpusRunner:
    """Tokenize many input files to per-file outputs, resumably."""

    def __init__(self, tok, out_dir: str, flags: int = SIMPLE, engine=None,
                 manifest_name: str = "manifest.json"):
        self.tok = tok
        self.out_dir = out_dir
        self.flags = flags
        self.engine = engine
        os.makedirs(out_dir, exist_ok=True)
        self.manifest_path = os.path.join(out_dir, manifest_name)
        self.manifest = self._load_manifest()

    def _load_manifest(self) -> dict:
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path, encoding="utf-8") as f:
                return json.load(f)
        return {"flags": self.flags, "files": {}}

    def _save_manifest(self) -> None:
        # atomic write so a crash never corrupts resume state
        fd, tmp = tempfile.mkstemp(dir=self.out_dir, suffix=".manifest")
        with os.fdopen(fd, "w", encoding="utf-8") as f:
            json.dump(self.manifest, f, indent=1)
        os.replace(tmp, self.manifest_path)

    def _done(self, path: str, src_hash: str) -> bool:
        ent = self.manifest["files"].get(path)
        return bool(ent) and ent.get("src") == src_hash and ent.get("ok")

    def _writer(self):
        """C++ TokenWriter when available (byte-identical — parity is
        pinned by tests); ~two orders faster bulk formatting."""
        try:
            from ..utils.native import NativeWriter

            return NativeWriter(self.flags)
        except Exception:
            return TokenWriter(self.flags)

    def out_path(self, path: str) -> str:
        base = os.path.basename(path)
        return os.path.join(self.out_dir, base + ".tok")

    def run(self, files: Sequence[str], verbose: bool = False) -> dict:
        """Process files, skipping ones already completed.  Returns stats."""
        if self.engine is None:
            from .jax_engine import BatchEngine

            self.engine = BatchEngine(self.tok)
        done = skipped = bytes_in = bytes_out = 0
        for path in files:
            with open(path, "rb") as f:
                data = f.read()
            src_hash = _sha(data)
            if self._done(path, src_hash):
                skipped += 1
                continue
            text = data.decode("utf-8", errors="replace")
            w = self._writer()
            tokenize_stream(self.tok, text, w, engine=self.engine)
            out = w.getvalue().encode("utf-8")
            with open(self.out_path(path), "wb") as f:
                f.write(out)
            self.manifest["files"][path] = {
                "src": src_hash,
                "out": _sha(out),
                "bytes_in": len(data),
                "bytes_out": len(out),
                "ok": True,
            }
            self._save_manifest()
            done += 1
            bytes_in += len(data)
            bytes_out += len(out)
            if verbose:
                print(f"done {path} ({len(data)} -> {len(out)} bytes)")
        return {
            "done": done,
            "skipped": skipped,
            "total": len(files),
            "bytes_in": bytes_in,
            "bytes_out": bytes_out,
        }
