"""Generate CATALOG.md: the full query inventory with category, oracle
status, and one-line description (from each query's docstring)."""

from __future__ import annotations

import sys

sys.path.insert(0, ".")


def _first_sentence(doc: str) -> str:
    """First FULL sentence of the docstring, newlines collapsed — the
    first-physical-line extraction truncated multi-line opening sentences
    mid-clause (VERDICT r5 #8). Sentence end = '. ' / '.\\n' / final '.',
    ignoring periods inside e.g./i.e. and decimals."""
    text = " ".join(
        ln.strip() for ln in doc.strip().split("\n\n")[0].splitlines()
    ).strip()
    i = 0
    while True:
        j = text.find(".", i)
        if j == -1:
            return text.replace("|", "\\|")
        nxt = text[j + 1 : j + 2]
        prev = text[max(0, j - 3) : j].lower()
        # decimals ("3.14") never match: their nxt is a digit, not ''/' '.
        if (nxt == "" or nxt == " ") and not prev.endswith(
            ("e.g", "i.e", "etc", "vs")
        ):
            return text[:j].replace("|", "\\|")
        i = j + 1


def main() -> None:
    from govgis_nov2023_slim_spatial_server_spark.catalog import ORACLES, QUERIES

    # fixed display order for known modules; anything new lands at the end
    # (every registered query is rendered — no silent drops)
    order = ["relational", "vector_text", "spatial_mm", "advanced",
             "pipeline", "sketches", "streaming"]
    by_module: dict[str, list[str]] = {m: [] for m in order}
    for name, fn in QUERIES.items():
        mod = fn.__module__.rsplit(".", 1)[-1]
        by_module.setdefault(mod, []).append(name)
    modules = [m for m in by_module if by_module[m]]

    out = [
        "# CATALOG — query inventory",
        "",
        f"{len(QUERIES)} queries; {len(ORACLES)} DuckDB-oracle-checked"
        " (rows-only entries are approximate or non-SQL-expressible hash"
        " kernels, each validated in pytest instead).",
        "",
        "| query | module | oracle | description |",
        "|---|---|---|---|",
    ]
    for mod in modules:
        for name in sorted(by_module.get(mod, [])):
            fn = QUERIES[name]
            doc = _first_sentence(fn.__doc__ or "")
            flag = "✓" if name in ORACLES else "rows-only"
            out.append(f"| `{name}` | {mod} | {flag} | {doc} |")
    with open("CATALOG.md", "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"wrote CATALOG.md ({len(QUERIES)} queries)")


if __name__ == "__main__":
    main()
