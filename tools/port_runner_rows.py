"""Extract a reference runner-test method's expected rows as Python
literals: python tools/port_runner_rows.py <suite.java-path|alias> name...

Parses `makeRow(query, "day", k1, v1, ...)` / `createExpectedRow(...)`
calls in the method body and prints one Python tuple per row plus the
column order — a transcription aid so golden pins are byte-faithful to
the reference suite (the assignment's parity mechanism; no engine code
is copied, only public test EXPECTED VALUES with provenance).
"""
import re
import sys

ALIASES = {
    "groupby": "/root/reference/processing/src/test/java/org/apache/"
               "druid/query/groupby/GroupByQueryRunnerTest.java",
    "topn": "/root/reference/processing/src/test/java/org/apache/"
            "druid/query/topn/TopNQueryRunnerTest.java",
    "scan": "/root/reference/processing/src/test/java/org/apache/"
            "druid/query/scan/ScanQueryRunnerTest.java",
    "timeseries": "/root/reference/processing/src/test/java/org/apache/"
                  "druid/query/timeseries/TimeseriesQueryRunnerTest.java",
}


def methods(path):
    src = open(path).read()
    out = {}
    for p in re.split(r"(?=  public void test)", src):
        m = re.match(r"  public void (test\w+)\(", p)
        if m:
            out[m.group(1)] = p
    return out


def split_args(s):
    out, depth, cur, instr = [], 0, [], False
    i = 0
    while i < len(s):
        c = s[i]
        if instr:
            cur.append(c)
            if c == '\\':
                cur.append(s[i + 1])
                i += 1
            elif c == '"':
                instr = False
        elif c == '"':
            instr = True
            cur.append(c)
        elif c in "([{":
            depth += 1
            cur.append(c)
        elif c in ")]}":
            depth -= 1
            cur.append(c)
        elif c == ',' and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(c)
        i += 1
    if cur:
        out.append("".join(cur).strip())
    return out


def pyval(tok):
    tok = tok.strip()
    if tok.startswith('"'):
        return tok[1:-1].replace('\\"', '"')
    if tok in ("null", "NullHandling.defaultStringValue()"):
        return None
    if tok in ("NullHandling.defaultLongValue()",
               "NullHandling.defaultDoubleValue()",
               "NullHandling.defaultFloatValue()"):
        return None
    m = re.fullmatch(r"(-?[\d_.]+(?:[eE][-+]?\d+)?)([LlFfDd]?)", tok)
    if m:
        num, suf = m.group(1).replace("_", ""), m.group(2).lower()
        if suf == 'l' or (suf == '' and re.fullmatch(r"-?\d+", num)):
            return int(num)
        return float(num)
    if tok.startswith("ImmutableList.of(") or tok.startswith("Arrays.asList("):
        inner = tok[tok.index("(") + 1:-1]
        return [pyval(t) for t in split_args(inner)] if inner.strip() else []
    return f"<?{tok}?>"


def extract(body):
    rows = []
    for m in re.finditer(
            r"(?:makeRow|createExpectedRow)\s*\(", body):
        start = m.end()
        depth, i, instr = 1, start, False
        while depth:
            c = body[i]
            if instr:
                if c == '\\':
                    i += 1
                elif c == '"':
                    instr = False
            elif c == '"':
                instr = True
            elif c == '(':
                depth += 1
            elif c == ')':
                depth -= 1
            i += 1
        args = split_args(body[start:i - 1])
        if args and args[0] in ("query", "fullQuery", "allGranQuery",
                                "subquery", "outerQuery", "mergedQuery",
                                "baseQuery", "builder.build()", "query1", "query2"):
            args = args[1:]
        ts = pyval(args[0])
        kv = [(pyval(args[j]), pyval(args[j + 1]))
              for j in range(1, len(args) - 1, 2)]
        rows.append((ts, kv))
    return rows


def main():
    path = ALIASES.get(sys.argv[1], sys.argv[1])
    ms = methods(path)
    for name in sys.argv[2:]:
        body = ms.get(name)
        print("#", "=" * 66)
        print("#", name)
        if body is None:
            print("# MISSING")
            continue
        rows = extract(body)
        if not rows:
            print("# no makeRow calls (assert-style or loop-built)")
            continue
        cols = [k for k, _ in rows[0][1]]
        print("# columns:", ["__time"] + cols)
        for ts, kv in rows:
            vals = ", ".join(repr(v) for _, v in kv)
            print(f'    ("{ts}", {vals}),')


if __name__ == "__main__":
    main()
