"""Brief view: SQL string + expected rows only, per method.
python tools/ref_brief.py name [name...]"""
import re
import sys

from ref_method import methods


def brief(body: str) -> str:
    out = []
    # SQL strings: the first argument of testQuery( — java string concat
    for m in re.finditer(r'testQuery\(\s*((?:"(?:[^"\\]|\\.)*"\s*\+?\s*)+)',
                         body):
        sql = "".join(re.findall(r'"((?:[^"\\]|\\.)*)"', m.group(1)))
        sql = sql.replace("\\n", "\n").replace('\\"', '"')
        out.append("SQL: " + sql)
    # expected rows
    for m in re.finditer(r"ImmutableList\.of\(\s*((?:new Object\[\]\{[^}]*\},?\s*)+)\)",
                         body):
        out.append("EXPECTED:\n" + m.group(1))
    # conditional expected
    for m in re.finditer(r"(useDefault|NullHandling\.\w+\(\))\s*\?", body):
        out.append("HAS-CONDITIONAL: " + m.group(1))
        break
    for kw in ("expectedException", "ValidationException", "cannotPlan",
               "UnsupportedSQLQueryException", "assertQueryIsUnplannable",
               "CannotBuildQueryException", "queryContext"):
        if kw in body:
            out.append("NOTE: " + kw)
    return "\n".join(out)


if __name__ == "__main__":
    ms = methods()
    for w in sys.argv[1:]:
        print("=" * 60)
        print("##", w)
        print(brief(ms.get(w, "MISSING")))
