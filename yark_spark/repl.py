"""Interactive REPL — full P7 parity with the reference's command surface
(`yark.py:18-34`, `cmds/__init__.py:7-22`), layered over the batch CLI.

Same dispatch semantics, genuinely rewritten (table-driven, not getattr):

- whitespace tokenization, first token is the command (case-insensitive),
  second the sub-command (`yark.py:20-22`, `cmds/__init__.py:9`);
- no sub-command → the command's ``default`` surface
  (`cmds/__init__.py:8`);
- unknown command → "Command X does not exist." (`yark.py:30`); unknown
  sub-command → 'Invalid sub-command: "x"' (`cmds/__init__.py:14`);
- errors print and the loop continues (`yark.py:35-36`); ``exit`` or EOF /
  Ctrl-C leaves (`yark.py:23,38-40`);
- destructive ops gate on a typed confirmation with the reference's fuzzy
  yes/maybe/no classification (X16, `utils.py:14-16,45-50`).

Commands map 1:1 onto the reference vocabulary:

    archive video <infodicts.json> | playlist <file.csv> | history <file.json>
    archive dump thumbnails <out_dir>
    archive lost
    unarchive video <video_id> | playlist <playlist_id | *>
    config | config get <key> <true|false>
    help [command]
    exit

I/O is injectable (``input_fn`` / ``print_fn``) so the loop is unit-testable
without a TTY; execution delegates to ``yark_spark.cli.main`` with the
confirmation already resolved (the CLI's --yes flag, P6).
"""

from __future__ import annotations

import os

from yark_spark import cli

# X16 (`utils.py:14-16`): fuzzy yes/maybe/no membership for confirmations.
YES = frozenset(["yes", "y", "yep", "sure", "ok", "okey", "ye", "do it", "why not"])
MAYBE = frozenset(["maybe", "perhaps", "possibly", "probably"])
NO = frozenset(["no", "n", "nah", "dont", "don't"])

HELP_GENERAL = """yark_spark:

    PySpark re-implementation of the reference archive engine.

    Command structure: <command> [method] [arguments]
    Eg.: archive video infodicts.json

    Commands (use <command> help to print additional help):
      archive    - Archive something into the store
      unarchive  - Delete something from the store
      config     - Show or change job configuration
      query      - Run SQL over the archive tables
      help       - Print information about any command
"""

HELP = {
    "archive": """Archive command:

    video: archive video [infodicts.json]
      Archive the metadata of a batch of videos (yt-dlp info-dict JSON).

    playlist: archive playlist [file.csv]
      Archive a Google Takeout playlist CSV. Overwriting an existing
      playlist asks for confirmation.

    history: archive history [watch-history.json]
      Archive a Google Takeout watch-history JSON file.

    dump: archive dump thumbnails [out_dir]
      Dump stored thumbnails to image files.

    lost: archive lost
      List videos quarantined as lost (the replay queue).
""",
    "unarchive": """Unarchive command:

    This command DELETES things from the store (confirmation required).

    video: unarchive video [video id]
      Delete a video and everything referencing it (comments, tags).

    playlist: unarchive playlist [playlist id | *]
      Delete one playlist (or all with '*') and its video references;
      the videos themselves are kept.
""",
    "config": """Config command:

    Show current configuration by typing 'config'.

    get: config get [key] [true/false]
      Toggle a boolean configuration key.
""",
    "query": """Query command:

    query [SQL]
      Run a SQL statement over the archive tables (videos, channels, ...).
""",
    "help": HELP_GENERAL,
}


class Repl:
    def __init__(self, spark, store_dir, config_path=None, input_fn=input, print_fn=print):
        self.spark = spark
        self.store = store_dir
        self.config_path = config_path or os.path.join(store_dir, "configs.json")
        self.input = input_fn
        self.print = print_fn

    # -- plumbing ----------------------------------------------------------

    def _cli(self, *argv) -> int:
        return cli.main([*argv, "--store", self.store], spark=self.spark)

    def confirm(self, prompt: str) -> bool:
        """`utils.py:45-50`: fuzzy-classified typed confirmation."""
        answer = self.input(f"{prompt} [confirm]: ").strip().lower()
        if answer in YES:
            return True
        if answer in MAYBE:
            self.print("I'll let you think about it.")
        elif answer not in NO:
            self.print("What ?")
        return False

    # -- commands ----------------------------------------------------------

    def cmd_archive(self, sub, args):
        if sub is None or sub == "help":
            return self.print(HELP["archive"])
        if sub == "video":
            return self._cli("archive-video", _one(args, "Missing path"))
        if sub == "history":
            return self._cli("archive-history", _one(args, "Missing path"))
        if sub == "playlist":
            path = _one(args, "Missing path")
            rc = self._cli("archive-playlist", path)
            # only the DISTINCT already-exists code triggers the overwrite
            # prompt — other failures (missing file, store error) must not
            # be retried with the destructive flag (ADVICE r2 #4)
            if rc == cli.RC_PLAYLIST_EXISTS and self.confirm(
                "Overwrite existing playlist ?"
            ):
                rc = self._cli("archive-playlist", path, "--yes")
            return rc
        if sub == "dump":
            if args[:1] != ["thumbnails"]:
                raise ValueError("Only 'archive dump thumbnails [out_dir]' is supported")
            return self._cli("dump-thumbnails", "--out", _one(args[1:], "Missing out_dir"))
        if sub == "lost":
            return self._cli("lost")
        raise ValueError(f'Invalid sub-command: "{sub}"')

    def cmd_unarchive(self, sub, args):
        if sub is None or sub == "help":
            return self.print(HELP["unarchive"])
        if sub == "video":
            vid = _one(args, "Missing video ID")
            if self.confirm(f"Delete video <{vid}> ?"):
                return self._cli("delete-video", vid, "--yes")
            return self.print("Aborting ...")
        if sub == "playlist":
            pid = _one(args, "Missing playlist ID")
            label = "all playlists" if pid == "*" else f"playlist <{pid}>"
            if self.confirm(f"Delete {label} ?"):
                return self._cli("delete-playlist", pid, "--yes")
            return self.print("Aborting ...")
        raise ValueError(f'Invalid sub-command: "{sub}"')

    def cmd_config(self, sub, args):
        from yark_spark.config import load, save

        cfg, problems = load(self.config_path)
        for p in problems:
            self.print(f"[config] {p}")
        if sub is None:
            for key, value in sorted(vars(cfg).items()):
                self.print(f"{key}: {value}")
            return
        if sub == "help":
            return self.print(HELP["config"])
        if sub == "get":  # reference verb (`cmds/configs.py:55-70`)
            if not args:
                raise ValueError("Get what ?")
            if len(args) < 2:
                raise ValueError("True or False ?")
            key, value = args[0], args[1].lower()
            if not hasattr(cfg, key):
                raise ValueError(f"Configuration {key} does not exist")
            if value not in ("true", "false"):
                raise ValueError("True or false ?")
            setattr(cfg, key, value == "true")
            save(self.config_path, cfg)
            return self.print(f"Get {key} set to <{value == 'true'}>")
        raise ValueError(f'Invalid sub-command: "{sub}"')

    def cmd_query(self, sub, args):
        if sub is None or sub == "help":
            return self.print(HELP["query"])
        return self._cli("query", " ".join([sub, *args]))

    def cmd_help(self, sub, args):
        if sub is None:
            return self.print(HELP_GENERAL)
        doc = HELP.get(sub.lower())
        if doc is None:
            raise NameError(f"Command {sub.capitalize()} does not exist.")
        return self.print(doc)

    COMMANDS = {
        "archive": cmd_archive,
        "unarchive": cmd_unarchive,
        "config": cmd_config,
        "query": cmd_query,
        "help": cmd_help,
    }

    # -- loop --------------------------------------------------------------

    def dispatch(self, line: str):
        tokens = line.split()
        if not tokens:
            return None
        cmd = tokens[0].lower()
        if cmd == "exit":
            raise SystemExit(0)
        handler = self.COMMANDS.get(cmd)
        if handler is None:
            raise NameError(f"Command {tokens[0].capitalize()} does not exist.")
        sub = tokens[1] if len(tokens) > 1 else None
        return handler(self, sub, tokens[2:])

    def run(self) -> None:
        self.print("[ yark_spark ]\n")
        while True:
            try:
                self.dispatch(self.input("> "))
            except SystemExit:
                break
            except (EOFError, KeyboardInterrupt):
                self.print("")
                break
            except Exception as exc:  # `yark.py:35-36`: print and continue
                self.print(f"error: {exc}")
            self.print("")


def _one(args, message):
    if not args:
        raise ValueError(message)
    return args[0]


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(prog="yark_spark.repl", description=__doc__)
    p.add_argument("--store", required=True, help="ParquetStore directory")
    args = p.parse_args(argv)

    from yark_spark.session import get_spark

    spark = get_spark("yark_spark-repl", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "4")))
    spark.sparkContext.setLogLevel("ERROR")
    try:
        Repl(spark, args.store).run()
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
