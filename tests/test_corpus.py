"""Corpus runner: resumable manifest processing."""

import json
import os


def test_corpus_runner_resume(mat_de, tmp_path):
    from datok_tpu.runtime.corpus import CorpusRunner

    files = []
    for i in range(3):
        p = tmp_path / f"in{i}.txt"
        p.write_text(f"Text {i}. Der alte Mann!\x04Zweiter Satz {i}.")
        files.append(str(p))

    out = tmp_path / "out"
    r = CorpusRunner(mat_de, str(out))
    stats = r.run(files)
    assert (stats["done"], stats["skipped"], stats["total"]) == (3, 0, 3)
    assert stats["bytes_in"] > 0 and stats["bytes_out"] > 0
    for p in files:
        expected = mat_de.tokenize(open(p, encoding="utf-8").read())
        assert open(r.out_path(p), encoding="utf-8").read() == expected

    # resume skips completed files
    r2 = CorpusRunner(mat_de, str(out))
    stats = r2.run(files)
    assert (stats["done"], stats["skipped"], stats["total"]) == (0, 3, 3)

    # changed source re-processes
    open(files[1], "w", encoding="utf-8").write("Neu!")
    stats = CorpusRunner(mat_de, str(out)).run(files)
    assert (stats["done"], stats["skipped"], stats["total"]) == (1, 2, 3)

    m = json.load(open(out / "manifest.json", encoding="utf-8"))
    assert len(m["files"]) == 3
