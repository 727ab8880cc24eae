"""Reference-compatible model namespace (`from nets import model`, ...).

Thin adapters over tensorflow_ocr_tpu.models / .ops.losses preserving the
public names of /root/reference/nets/. TF1 graph functions became pure JAX
functions: model builders take/return arrays plus an explicit `variables`
pytree (pass None to initialize fresh weights with a fixed seed).
"""
