"""Entry-point alias (the reference README documents ``main.py`` but ships
only ``main_val.py`` — SURVEY.md §2.5; this rebuild provides both)."""

from encdiff_tpu.train.data import DataModuleFromConfig  # noqa: F401 (config target parity)
from encdiff_tpu.train.callbacks import ImageLogger  # noqa: F401
from encdiff_tpu.train.harness import main

if __name__ == "__main__":
    main()
