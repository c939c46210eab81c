"""CLI mirroring the reference's option surface and exit-code policy.

Reference parser: a stateful positional scanner with GLOBAL/IN/OUT/DBPATH/
INIT_SQL contexts (/root/reference/src/main/kotlin/cz/dynawest/csvcruncher/
app/OptionsParser.kt:18-308, context enum :352-354) — ``-in`` opens an
import context, ``-out`` an export context, per-context options apply to
the most recent one. Exit codes per App.kt:36-59: config error 1, SQL
syntax 11, known cruncher error 20, unknown 127.

Run: ``python -m csv_cruncher_spark.cli -in data/ -out result.csv
-sql "SELECT ... FROM $table"`` — or via ``spark-submit --py-files``.
"""

from __future__ import annotations

import sys

from .crunch import ConfigError, Cruncher, CruncherError, ExportSpec, ImportSpec, Options, SqlSyntaxError
from .sources.discovery import CombineMode, SortMethod

_COMBINE_DIRS = {
    "perDir": CombineMode.PER_DIR,
    "perInputDir": CombineMode.PER_INPUT_DIR,
    "all": CombineMode.ALL,
}
_SORTS = {
    "paramsOrder": SortMethod.PARAMS_ORDER,
    "alpha": SortMethod.ALPHA,
    "time": SortMethod.TIME,
}


def parse_args(argv: list[str]) -> Options:
    imports: list[ImportSpec] = []
    exports: list[ExportSpec] = []
    opts = Options(imports=imports, exports=exports)
    ctx: str | None = None  # None=GLOBAL, 'in', 'out'
    i = 0

    def cur_import() -> ImportSpec:
        if ctx != "in" or not imports:
            raise ConfigError("Option must follow -in <path>")
        return imports[-1]

    def cur_export() -> ExportSpec:
        if ctx != "out" or not exports:
            raise ConfigError("Option must follow -out <path>")
        return exports[-1]

    while i < len(argv):
        a = argv[i]
        key, _, val = a.partition("=")
        if a == "-in":
            i += 1
            imports.append(ImportSpec(path=_need(argv, i, "-in")))
            ctx = "in"
        elif a == "-out":
            i += 1
            exports.append(ExportSpec(path=_need(argv, i, "-out")))
            ctx = "out"
        elif a == "-sql":
            i += 1
            opts.sql = _need(argv, i, "-sql")
        elif a == "-as":
            i += 1
            cur_import().alias = _need(argv, i, "-as")
        elif a == "-itemsAt":
            i += 1
            cur_import().items_at = _need(argv, i, "-itemsAt")
        elif a == "-initSql":
            i += 1
            opts.init_sql.append(_need(argv, i, "-initSql"))
        elif a == "-indexed":
            i += 1
            cur_import().indexed = _need(argv, i, "-indexed").split(",")
        elif key == "-ignoreFirstLines":
            cur_import().ignore_first_lines = int(val) if val else 1
        elif key == "-ignoreLineRegex":
            cur_import().ignore_line_regex = val or None
        elif key == "-format":
            cur_import().format = val
        elif key == "-include":
            opts.include = val
        elif key == "-exclude":
            opts.exclude = val
        elif key == "-combineInputs":
            if val and val != "concat":
                # reference declares intersect/substract but throws
                # (OptionsEnums.kt:47-62); we map them to set ops via SQL
                raise ConfigError(
                    f"combineInputs={val}: use SQL INTERSECT/EXCEPT instead"
                )
            if opts.combine == CombineMode.NONE:
                opts.combine = CombineMode.ALL
        elif key == "-combineDirs":
            opts.combine = _COMBINE_DIRS.get(val or "perDir") or _fail_enum(
                "combineDirs", val, _COMBINE_DIRS
            )
        elif key == "-sort":
            opts.sort = _SORTS.get(val or "alpha") or _fail_enum("sort", val, _SORTS)
        elif key == "-rowNumbers":
            opts.row_numbers = int(val) if val else True
        elif a == "-queryPerInputSubpart":
            opts.query_per_input_subpart = True
        elif a == "-overwrite":
            opts.overwrite = True
        elif key == "-json":
            if exports:
                exports[-1].format = "json"
                exports[-1].json_mode = val or "entries"
            else:
                raise ConfigError("-json must follow -out")
        elif a in ("-db", "-dbPath"):
            i += 1  # HSQLDB working dir — meaningless here, accepted+ignored
        elif a == "-logLevel":
            i += 1
        else:
            raise ConfigError(f"Unknown option: {a}")
        i += 1
    return opts


def _need(argv: list[str], i: int, opt: str) -> str:
    if i >= len(argv):
        raise ConfigError(f"{opt} requires a value")
    return argv[i]


def _fail_enum(name: str, val: str, allowed: dict) -> None:
    raise ConfigError(f"Bad {name}={val}; allowed: {', '.join(allowed)}")


def main_no_exit(argv: list[str], spark=None) -> int:
    """App.mainNoExit parity: returns the exit code instead of exiting."""
    try:
        options = parse_args(argv)
        if spark is None:
            from .session import get_spark

            spark = get_spark(app_name="csv-cruncher-spark")
        Cruncher(options).run(spark)
        return 0
    except ConfigError as e:
        print(f"Config error: {e}", file=sys.stderr)
        return 1
    except SqlSyntaxError as e:
        print(f"SQL syntax error: {e}", file=sys.stderr)
        return 11
    except CruncherError as e:
        print(f"Error: {e}", file=sys.stderr)
        return 20
    except Exception as e:  # noqa: BLE001
        print(f"Unexpected error: {e}", file=sys.stderr)
        return 127


def main() -> None:
    sys.exit(main_no_exit(sys.argv[1:]))


if __name__ == "__main__":
    main()
