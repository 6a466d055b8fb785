"""`python -m f_lite_tpu.train` — parity with `python -m f_lite.train`."""

from f_lite_tpu.train.trainer import main

main()
