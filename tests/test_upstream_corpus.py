"""Run the ported upstream PromQL test corpus through the golden DSL.

The files under ``tests/promql_testdata/`` are ports of the public
upstream PromQL test scripts (the vendored tree ships them stripped;
``SURVEY.md §5`` names the corpus and ``vendor/.../promql/test.go``
defines the format). The upstream runner's ``clear`` command resets
the storage between sections — here each ``clear``-separated section
runs as an independent :class:`GoldenTest`.
"""

from __future__ import annotations

import pathlib

import pytest

from timbala_spark.testdsl import run_golden

DATA = pathlib.Path(__file__).parent / "promql_testdata"
FILES = sorted(p.name for p in DATA.glob("*.test"))


def _sections(content: str) -> list[str]:
    out, cur = [], []
    for line in content.split("\n"):
        if line.strip() == "clear":
            out.append("\n".join(cur))
            cur = []
        else:
            cur.append(line)
    out.append("\n".join(cur))
    return [s for s in out if s.strip()]


@pytest.mark.parametrize("fname", FILES)
def test_upstream_corpus(spark, fname):
    content = (DATA / fname).read_text()
    for i, section in enumerate(_sections(content)):
        try:
            run_golden(spark, section)
        except AssertionError as e:
            raise AssertionError(f"{fname} section {i}: {e}") from e
