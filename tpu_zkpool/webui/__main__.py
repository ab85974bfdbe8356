import jax

jax.config.update("jax_platforms", "cpu")  # UI work is host-side

from tpu_zkpool.webui.server import main

main()
