from f_lite_tpu.native import available, build

if build() and available():
    print("native image_ops built and loadable")
else:
    raise SystemExit("native build failed (toolchain missing?)")
