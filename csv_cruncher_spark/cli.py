"""CLI mirroring the reference's option surface and exit-code policy.

Reference parser: a stateful positional scanner with GLOBAL/IN/OUT/DBPATH/
INIT_SQL contexts (/root/reference/src/main/kotlin/cz/dynawest/csvcruncher/
app/OptionsParser.kt:18-308, context enum :352-354) — ``-in`` opens an
import context, ``-out`` an export context, ``-all`` returns to GLOBAL,
bare (non-dash) arguments bind to the open context (paths, init scripts).
Accepted spellings are VERBATIM the reference's: single-dash contextual
options (``-in``, ``-out``, ``-sql``, ``-as``, ``-format``, ``-itemsAt``,
``-indexed``, ``-initSql``, ``-db``) take their value as the NEXT argument;
double-dash global options (``--include=``, ``--exclude=``,
``--ignoreFirstLines[=N]``, ``--ignoreLinesMatching=``,
``--rowNumbers[=N]``, ``--sortInputPaths[=...]``,
``--sortInputFileGroups[=...]``, ``--combineInputs[=...]``,
``--combineDirs[=...]``, ``--json[=entries|array]``,
``--queryPerInputSubpart``, ``--skipNonReadable``, ``--overwrite``,
``--keepWorkFiles``, ``--logLevel=...``, ``-v``/``--version``,
``-h``/``--help``) inline their value after ``=`` (OptionsParser.kt
:139-266). A reference user's command line runs unmodified
(it/OptionsCombinationsTest.kt command strings replayed in
tests/test_crunch.py). The pre-round-4 single-dash ``-ignoreFirstLines=``
style spellings remain accepted as per-import variants.

Exit codes per App.kt:36-59: config error 1, SQL syntax 11, known
cruncher error 20, unknown 127.

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
    # the reference's optionValue is "paramOrder" (OptionsEnums.kt:10);
    # "paramsOrder" was this repo's pre-round-4 spelling — both accepted
    "paramOrder": SortMethod.PARAMS_ORDER,
    "paramsOrder": SortMethod.PARAMS_ORDER,
    "alpha": SortMethod.ALPHA,
    "time": SortMethod.TIME,
}

_USAGE = (
    "Usage: csv-cruncher [global options] -in <path> [import options] "
    "-out <path> [export options] -sql <SQL>\n"
    "See the reference README for the full option list; all reference "
    "spellings are accepted verbatim."
)


def parse_args(argv: list[str]) -> Options | None:
    """Returns the parsed Options, or ``None`` for ``-v``/``-h`` (the
    reference prints and returns null, App exits 0)."""
    imports: list[ImportSpec] = []
    exports: list[ExportSpec] = []
    opts = Options(imports=imports, exports=exports)
    ctx: str | None = None  # None=GLOBAL, 'in', 'out', 'db', 'initSql'
    # global (double-dash) per-import settings are applied to EVERY import
    # at end-of-parse, like the reference's Options-level fields
    g_ignore_first: int | None = None
    g_ignore_regex: str | None = None
    g_json: str | None = None
    i = 0

    def cur_import() -> ImportSpec:
        if ctx != "in" or not imports:
            raise ConfigError("Option must follow -in <path>")
        return imports[-1]

    def cur_export() -> ExportSpec:
        if ctx != "out" or not exports:
            raise ConfigError("Option must follow -out <path>")
        return exports[-1]

    def enum_value(arg: str, name: str, table: dict, bare):
        """``--name`` → bare default; ``--name=v`` → table[v] (reference
        throws on unknown values, OptionsParser.kt:210-263)."""
        if arg == f"--{name}":
            return bare
        val = arg[len(f"--{name}="):]
        if not arg.startswith(f"--{name}=") or val not in table:
            raise ConfigError(
                f"Unknown value for {name}: {arg} Try one of {', '.join(table)}"
            )
        return table[val]

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
        elif a == "-all":
            ctx = None
        elif a == "-sql":
            i += 1
            opts.sql = _need(argv, i, "-sql")
            # reference: -sql opens/continues the OUT context
            # (OptionsParser.kt:103-114)
            if exports:
                ctx = "out"
        elif a == "-as":
            i += 1
            alias = _need(argv, i, "-as")
            if ctx == "out" and exports:
                pass  # export alias: accepted (names the result view)
            else:
                cur_import().alias = alias
        elif a == "-itemsAt":
            i += 1
            cur_import().items_at = _need(argv, i, "-itemsAt")
        elif a == "-initSql":
            # reference: opens the INIT_SQL context; following bare args
            # are script paths. The historical one-value form also works.
            if i + 1 < len(argv) and not argv[i + 1].startswith("-"):
                ctx = "initSql"
            else:
                raise ConfigError("-initSql requires a script path")
        elif a == "-indexed":
            i += 1
            cur_import().indexed = _need(argv, i, "-indexed").split(",")
        elif key == "-ignoreFirstLines":
            cur_import().ignore_first_lines = int(val) if val else 1
        elif key == "--ignoreFirstLines":
            g_ignore_first = int(val) if val else 1
        elif key == "-ignoreLineRegex":
            cur_import().ignore_line_regex = val or None
        elif key == "--ignoreLinesMatching":
            if not val:
                raise ConfigError(
                    "Option --ignoreLinesMatching has to have a value "
                    "(regular expression)."
                )
            g_ignore_regex = val
        elif a == "-format":
            i += 1
            fmt = _need(argv, i, "-format").lower()
            if ctx == "out" and exports:
                exports[-1].format = fmt
            else:
                cur_import().format = fmt
        elif key == "-format":
            cur_import().format = val
        elif key in ("-include", "--include"):
            if key == "--include" and not val:
                raise ConfigError(
                    "Option --include has to have a value (regular expression)."
                )
            opts.include = val
        elif key in ("-exclude", "--exclude"):
            if key == "--exclude" and not val:
                raise ConfigError(
                    "Option --exclude has to have a value (regular expression)."
                )
            opts.exclude = val
        elif key in ("-combineInputs", "--combineInputs"):
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
        elif key == "--combineDirs":
            if val == "perInputSubdir":
                # accepted by the reference parser but its only test is
                # @Disabled("Not yet implemented") — fail loudly rather
                # than silently picking a different grouping
                raise ConfigError(
                    "combineDirs=perInputSubdir is not implemented "
                    "(disabled in the reference too); use perDir, "
                    "perInputDir or all"
                )
            # bare --combineDirs → all (OptionsParser.kt:255-256)
            opts.combine = enum_value(a, "combineDirs", _COMBINE_DIRS, CombineMode.ALL)
        elif key == "-sort":
            opts.sort = _SORTS.get(val or "alpha") or _fail_enum("sort", val, _SORTS)
        elif key == "--sortInputPaths":
            opts.sort = enum_value(a, "sortInputPaths", _SORTS, SortMethod.PARAMS_ORDER)
        elif key == "--sortInputFileGroups":
            opts.sort_file_groups = enum_value(
                a, "sortInputFileGroups", _SORTS, SortMethod.ALPHA
            )
        elif key in ("-rowNumbers", "--rowNumbers"):
            opts.row_numbers = int(val) if val else True
        elif a in ("-queryPerInputSubpart", "--queryPerInputSubpart"):
            opts.query_per_input_subpart = True
        elif a in ("-overwrite", "--overwrite"):
            opts.overwrite = True
        elif a == "--skipNonReadable":
            opts.skip_non_readable = True
        elif a == "--keepWorkFiles":
            pass  # no HSQLDB work files exist here; accepted for parity
        elif key == "--logLevel":
            pass  # logging is Spark-conf driven; accepted for parity
        elif key == "-json":
            if exports:
                exports[-1].format = "json"
                exports[-1].json_mode = val or "entries"
            else:
                raise ConfigError("-json must follow -out")
        elif key == "--json":
            # global in the reference (jsonExportFormat, Options.kt):
            # applies to every export regardless of position
            g_json = val or "entries"
        elif a in ("-v", "--version"):
            from . import __version__

            print(f" CSV Cruncher (PySpark) version {__version__}")
            return None
        elif a in ("-h", "--help"):
            print(_USAGE)
            return None
        elif a in ("-db", "-dbPath"):
            ctx = "db"  # HSQLDB working dir — meaningless here; consumed
        elif a == "-logLevel":
            i += 1
        elif not a.startswith("-") or a == "-":
            # bare argument binds to the open context (OptionsParser.kt:54-88)
            if ctx == "in" and imports:
                imports[-1].path = a
            elif ctx == "out" and exports:
                exports[-1].path = a
            elif ctx == "db":
                pass
            elif ctx == "initSql":
                opts.init_sql.append(a)
            else:
                raise ConfigError(
                    f"Not sure what to do with the argument at this place: {a}"
                )
        else:
            raise ConfigError(f"Unknown option: {a}")
        i += 1

    if g_ignore_first is not None:
        for im in imports:
            im.ignore_first_lines = g_ignore_first
    if g_ignore_regex is not None:
        for im in imports:
            im.ignore_line_regex = g_ignore_regex
    if g_json is not None:
        for ex in exports:
            ex.format = "json"
            ex.json_mode = g_json
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
        if options is None:  # -v / -h: printed, exit 0 (App.kt:31-34)
            return 0
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
