"""Invocation alias of cli.main_other.

The reference maintains main_other.py and main_other_simple.py as
near-duplicate entries (SURVEY 2.3); this build folds them into one CLI
(main_other carries the union: --load-tagging-only, fusion-aware eval, the
train-data validation pass) and keeps this module so
`python -m xtagclip_tpu.cli.main_other_simple` keeps working.
"""

from xtagclip_tpu.cli.main_other import main

if __name__ == "__main__":
    import sys

    main(sys.argv[1:])
