"""The README quickstart must actually run (API surface regression guard)."""

import re


def test_quickstart_executes(tmp_path):
    with open(__file__.rsplit("/tests/", 1)[0] + "/README.md") as fh:
        readme = fh.read()
    block = re.search(r"## Quick start\n\n```python\n(.*?)```", readme, re.S).group(1)
    block = block.replace('"/data/search"', repr(str(tmp_path / "search")))
    namespace: dict = {}
    exec(compile(block, "README-quickstart", "exec"), namespace)
    assert namespace["rows"], "quickstart query returned nothing"
    assert namespace["rows"][0]["level"] == "error"
