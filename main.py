#!/usr/bin/env python
"""Top-level CLI entry point (same invocation surface as the reference's
main.py): python main.py --mode {preprocess,train_classifier,train_dehazing,
train_joint,train_all,evaluate,demo}"""
from adam_dehaze_tpu.cli import main

if __name__ == "__main__":
    main()
