"""Minimal read-only xlsx parser (stdlib zipfile + regex).

The sandbox has no openpyxl; the only xlsx consumers are the golden-parity
tests, which read the reference's input workbook
(/root/reference/input_time_series.xlsx — one sheet per year, row 1 title,
row 2 header ``Date, Consumption, Wind, PV``, rows 3+ half-hourly values;
see /root/reference/import_excel.py:22-36) and the golden coefficient
workbooks (/root/reference/betas/*/betas_*.xlsx — one sheet per year, one
column per time scale).

This is not a general xlsx library: it handles numeric cells, shared and
inline strings, and the default A1 reference grid, which is all those files
contain.
"""

from __future__ import annotations

import re
import zipfile

_CELL_RE = re.compile(r"<c ([^>/]*)>(.*?)</c>", re.S)
_ATTR_R_RE = re.compile(r'r="([A-Z]+)(\d+)"')
_ATTR_T_RE = re.compile(r't="(\w+)"')
_V_RE = re.compile(r"<v>(.*?)</v>", re.S)
_IS_RE = re.compile(r"<t[^>]*>(.*?)</t>", re.S)
_SHEET_RE = re.compile(r'<sheet [^>]*?name="([^"]+)"[^>]*?r:id="(rId\d+)"')
_REL_RE = re.compile(r'<Relationship [^>]*?Id="(rId\d+)"[^>]*?Target="([^"]+)"')
_SST_RE = re.compile(r"<si>(.*?)</si>", re.S)


def _col_to_idx(letters: str) -> int:
    idx = 0
    for ch in letters:
        idx = idx * 26 + (ord(ch) - 64)
    return idx - 1


class XlsxFile:
    def __init__(self, path: str):
        self._zf = zipfile.ZipFile(path)
        wb = self._zf.read("xl/workbook.xml").decode("utf-8")
        rels = self._zf.read("xl/_rels/workbook.xml.rels").decode("utf-8")
        rid_target = dict(_REL_RE.findall(rels))
        self.sheet_names: list[str] = []
        self._sheet_paths: dict[str, str] = {}
        for name, rid in _SHEET_RE.findall(wb):
            target = rid_target[rid]
            if not target.startswith("xl/"):
                target = "xl/" + target.lstrip("/")
            self.sheet_names.append(name)
            self._sheet_paths[name] = target
        self._shared: list[str] = []
        try:
            sst = self._zf.read("xl/sharedStrings.xml").decode("utf-8")
            for si in _SST_RE.findall(sst):
                self._shared.append("".join(_IS_RE.findall(si)))
        except KeyError:
            pass
        self._columns_cache: dict[str, dict[int, dict[int, object]]] = {}

    def cells(self, sheet_name: str):
        """Yield (row0, col0, value) — value float for numeric cells, str for
        string cells. 0-indexed."""
        xml = self._zf.read(self._sheet_paths[sheet_name]).decode("utf-8")
        for attrs, body in _CELL_RE.findall(xml):
            rm = _ATTR_R_RE.search(attrs)
            if rm is None:
                continue
            letters, row = rm.group(1), rm.group(2)
            tm = _ATTR_T_RE.search(attrs)
            ctype = tm.group(1) if tm else ""
            vm = _V_RE.search(body)
            if vm is None:
                im = _IS_RE.search(body)
                if im is None:
                    continue
                yield int(row) - 1, _col_to_idx(letters), im.group(1)
                continue
            raw = vm.group(1)
            if ctype == "s":
                yield int(row) - 1, _col_to_idx(letters), self._shared[int(raw)]
            elif ctype == "str" or ctype == "inlineStr":
                yield int(row) - 1, _col_to_idx(letters), raw
            else:
                yield int(row) - 1, _col_to_idx(letters), float(raw)

    def columns(self, sheet_name: str) -> dict[int, dict[int, object]]:
        """{col0: {row0: value}} for one sheet, memoized per instance: the
        golden coefficient loaders read one column at a time, and without
        the memo each of a sheet's 16 scale columns re-parsed the whole
        sheet XML (~50 ms) — 17x the cold-start cost of every
        golden-parity driver query (measured 18.6 s of the
        full_decomposition cold wall; round-3 verdict item)."""
        cached = self._columns_cache.get(sheet_name)
        if cached is not None:
            return cached
        out: dict[int, dict[int, object]] = {}
        for r, c, v in self.cells(sheet_name):
            out.setdefault(c, {})[r] = v
        self._columns_cache[sheet_name] = out
        return out

    def column_floats(self, sheet_name: str, col0: int, skip_rows: int = 0):
        """Dense float list for one column, rows >= skip_rows, stopping at the
        first gap (the golden workbooks write contiguous columns from row 0)."""
        col = self.columns(sheet_name).get(col0, {})
        vals = []
        r = skip_rows
        while r in col:
            vals.append(float(col[r]))
            r += 1
        return vals
