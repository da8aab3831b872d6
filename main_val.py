"""Entry-point parity shim: ``python main_val.py -b <config> -t``.

The reference's harness lives in ``main_val.py`` (and its configs reference a
non-existent ``main.py`` — SURVEY.md §2.5); both names delegate to
``encdiff_tpu.train.harness`` here.
"""

from encdiff_tpu.train.data import DataModuleFromConfig  # noqa: F401 (config target parity)
from encdiff_tpu.train.callbacks import ImageLogger  # noqa: F401
from encdiff_tpu.train.harness import main

if __name__ == "__main__":
    main()
