from setuptools import find_packages, setup

setup(
    name="lora_tpu",
    version="0.1.0",
    description=(
        "TPU-native (JAX/XLA/Pallas) LoRA fine-tuning framework for "
        "Stable Diffusion: pivotal tuning inversion, DreamBooth, SVD "
        "distillation, LoRA merge/join, bit-compatible safetensors interop."
    ),
    packages=find_packages(exclude=("tests",)),
    install_requires=["jax", "numpy", "einops"],
    entry_points={
        "console_scripts": [
            # parity with the reference console scripts (setup.py:13-20)
            "lora_add = lora_tpu.cli.lora_add:main",
            "lora_pti = lora_tpu.cli.lora_pti:main",
            "lora_distill = lora_tpu.cli.lora_distill:main",
            "lora_ppim = lora_tpu.cli.lora_ppim:main",
            # beyond-reference entry points
            "lora_db = lora_tpu.cli.lora_db:main",
            "lora_ti = lora_tpu.cli.lora_ti:main",
            "lora_serve = lora_tpu.serve:main",
            "lora_kohya = lora_tpu.cli.kohya_convert:main",
            "lora_launch = lora_tpu.launch:main",
        ],
    },
    python_requires=">=3.10",
)
