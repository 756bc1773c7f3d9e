"""Train on TPU, then recall-vs-exact sweep across approximate algorithms."""
import json, time, numpy as np, jax, jax.numpy as jnp
def log(*a): print(f'[{time.time()-T0:7.1f}s]', *a, flush=True)
T0=time.time()
from rails_tpu.core.config import get_experiment_config
from rails_tpu.data.datasets import get_reco_dataset
from rails_tpu.train.driver import run_training
from rails_tpu.train import evaluation as ev

cfg = get_experiment_config('ml-1m-hstu-mol')
cfg = cfg.replace(
    data=cfg.data.replace(dataset_name='synthetic', max_sequence_length=64,
                          synthetic_num_users=16384, synthetic_num_items=20000),
    mol=cfg.mol.replace(uid_embedding_hash_sizes=(16384,)),
    train=cfg.train.replace(local_batch_size=128, eval_batch_size=128,
                            num_negatives=128, num_epochs=8,
                            eval_interval=1000, partial_eval_num_iters=4,
                            full_eval_every_n=100, item_embedding_dim=50),
)
ds = get_reco_dataset(cfg.data)
log('dataset ready', len(ds.train_dataset), 'examples', ds.num_unique_items, 'items')
res = run_training(cfg, workdir=None, use_mesh=False, dataset=ds)
log('trained; partial-eval metrics:', {k: round(v,4) for k,v in res.final_metrics.items() if k in ('hr@10','hr@50','hr@200','ndcg@10','mrr')})
model, params = res.model, res.state.params

batches = []
for i, b in enumerate(ds.eval_dataset.batches(batch_size=128, max_output_length=cfg.train.gr_output_length+1, shuffle=True, seed=7, drop_last=True)):
    batches.append(b)
    if len(batches) >= 16: break   # 2048 users

t = cfg.train
exact = ev.get_eval_state(model, params, ds.all_item_ids, 'MoLBruteForceTopK')
m, _ = ev.eval_metrics_from_batches(model, params, exact, batches, k=200)
s = ev.summarize_metrics(m)
log('EXACT quality:', {k: round(s[k],4) for k in ('hr@10','hr@50','hr@200','ndcg@10','mrr')})

results = {}
for alg in ['MoLAvgTopK400','MoLAvgTopK800','MoLAvgTopK1600','MoLNaiveTopK10','MoLNaiveTopK50','MoLCombTopK10_400','MoLCombTopK50_800']:
    st = ev.get_eval_state(model, params, ds.all_item_ids, alg)
    rec = ev.recall_vs_exact(model, params, exact, st, batches[:8], k=200)
    results[alg] = rec
    log(alg, {k: round(v,4) for k,v in rec.items() if k in ('recall@10','recall@50','recall@200')})
print(json.dumps(results))
