#!/usr/bin/env python
"""End-to-end overlapped pipeline throughput on the real chip.

Input text (UTF-8 str in host RAM) -> encode -> device machine ->
compacted-event fetch -> native wave formatting -> output bytes.
Prints stage seconds + MB/s.  The host<->device link here is the dev
tunnel (~30 MB/s): the fetch stage is tunnel-bound, so this script
reports both the measured wall and the per-stage rates that determine
production end-to-end (max over stages once the link is PCIe).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from bench import BENCH_TEXT

MB = int(os.environ.get("E2E_MB", "64"))
LANES = int(os.environ.get("E2E_LANES", "16384"))


def main():
    import datok_tpu as dt
    from datok_tpu.runtime.jax_engine import BatchEngine
    from datok_tpu.runtime.overlap import tokenize_stream_pipelined
    from datok_tpu.utils.native import NativeWriter

    tok = dt.load_matrix_file("/root/reference/testdata/tokenizer_de.matok")
    eng = BatchEngine(tok)

    doc = (BENCH_TEXT * 2)[:1022] + ".\x04"
    n_docs = (MB << 20) // len(doc.encode())
    text = doc * n_docs
    nbytes = len(text.encode())
    print(f"text: {nbytes/1e6:.1f} MB, {n_docs} docs")

    # warmup (compile at the wave shape)
    tokenize_stream_pipelined(tok, doc * 2048, engine=eng,
                              writer=NativeWriter(dt.SIMPLE), lanes=LANES)

    for trial in range(3):
        st = {}
        w = NativeWriter(dt.SIMPLE)
        t0 = time.time()
        tokenize_stream_pipelined(tok, text, engine=eng, writer=w,
                                  lanes=LANES, stats=st)
        out = w.getvalue()
        wall = time.time() - t0
        print(f"trial {trial}: wall {wall:.2f}s  e2e {nbytes/wall/1e6:.1f} MB/s  "
              f"out {len(out)/1e6:.1f} MB")
        tot = sum(st[k] for k in ("encode", "dispatch", "fetch", "decode", "format"))
        for k in ("encode", "dispatch", "fetch", "decode", "format"):
            print(f"  {k:9s} {st[k]:6.2f}s  ({nbytes/max(st[k],1e-9)/1e6:8.1f} MB/s)")
        print(f"  stages sum {tot:.2f}s vs wall {wall:.2f}s  "
              f"(overlap saves {max(0,tot-wall):.2f}s)  repairs={st['repairs']}")


if __name__ == "__main__":
    main()
