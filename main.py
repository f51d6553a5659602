"""Entry point mirroring the reference's `python main.py ...` invocation.

All reference flags work verbatim, e.g. the README repro commands
(/root/reference/README.md:24,31,35,40):

  python main.py --data_name=ogbl-ddi --emb_hidden_channels=512 \
      --gnn_hidden_channels=512 --mlp_hidden_channels=512 --num_neg=3 --dropout=0.3
"""

from plnlp_tpu.cli import main

if __name__ == "__main__":
    main()
