"""BERT4Rec masked-item training recipe.

Reference analog: examples/bert4rec/bert4rec_main.py (EC + transformer,
NDCG@10 / Recall@10 eval). One jitted masked-LM step over padded sequences.

Run: JAX_PLATFORMS=cpu python examples/bert4rec_train.py
"""

import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from torchrec_tpu.models import BERT4Rec, ndcg_at_k, recall_at_k


def main(steps=150, batch=32, vocab=200, seq_len=16):
    model = BERT4Rec(vocab_size=vocab, max_seq_len=seq_len, emb_dim=64,
                     num_layers=2, num_heads=4)
    params = model.init(jax.random.key(0))
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    rng = np.random.default_rng(0)

    def make_batch():
        # synthetic sequential structure: next item = prev + 1 mod vocab
        start = rng.integers(0, vocab, (batch, 1))
        ids = (start + np.arange(seq_len)) % vocab
        valid = np.ones((batch, seq_len), bool)
        masked = np.zeros((batch, seq_len), bool)
        pos = rng.integers(1, seq_len, batch)
        masked[np.arange(batch), pos] = True
        inp = ids.copy()
        inp[masked] = model.mask_token
        return (jnp.asarray(inp.astype(np.int32)), jnp.asarray(valid),
                jnp.asarray(ids.astype(np.int32)), jnp.asarray(masked))

    @jax.jit
    def step(params, opt_state, inp, valid, tgt, masked):
        loss, g = jax.value_and_grad(model.masked_lm_loss)(
            params, inp, valid, tgt, masked
        )
        updates, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    for i in range(steps):
        params, opt_state, loss = step(params, opt_state, *make_batch())
        if (i + 1) % 50 == 0:
            print(f"step {i+1}: mlm loss {float(loss):.4f}")

    # eval: predict the masked item, report recall@10 / NDCG@10
    inp, valid, tgt, masked = make_batch()
    hidden = model.encode(params, inp, valid)
    lg = model.logits(params, hidden)
    pos = np.argmax(np.asarray(masked), axis=1)
    scores = jnp.stack([lg[b, pos[b], :vocab] for b in range(batch)])
    targets = jnp.asarray([int(np.asarray(tgt)[b, pos[b]]) for b in range(batch)])
    print(f"recall@10={float(recall_at_k(scores, targets, 10)):.2f} "
          f"ndcg@10={float(ndcg_at_k(scores, targets, 10)):.2f}")


if __name__ == "__main__":
    main()
