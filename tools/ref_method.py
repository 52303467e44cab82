"""Dump reference CalciteQueryTest methods: python tools/ref_method.py name [name...]"""
import re
import sys

SRC = ("/root/reference/sql/src/test/java/org/apache/druid/sql/calcite/"
       "CalciteQueryTest.java")


def methods(path=SRC):
    src = open(path).read()
    out = {}
    for p in re.split(r"(?=  public void test)", src):
        m = re.match(r"  public void (test\w+)\(", p)
        if m:
            out[m.group(1)] = p
    return out


if __name__ == "__main__":
    ms = methods()
    limit = int(sys.argv[1]) if sys.argv[1].isdigit() else None
    names = sys.argv[2:] if limit else sys.argv[1:]
    for w in names:
        print("=" * 60)
        body = ms.get(w, "MISSING")
        # compress: drop the native-query builder noise, keep SQL + expected
        print(body[:limit] if limit else body)
