import pyarrow.parquet as pq, pyarrow.dataset as ds
import numpy as np, time

# load full 200k embeddings from the 100x replica
d = ds.dataset('/tmp/graft_sfx10/embeddings.parquet')
t = d.to_table(columns=['vec_id','embedding'])
ids = np.array(t['vec_id'])
emb = np.array(t['embedding'].to_pylist(), dtype=np.float32)
order = np.argsort(ids)
ids, emb = ids[order], emb[order]
n, dim = emb.shape
print(f'n={n} dim={dim}')

def normalize(m):
    nrm = np.linalg.norm(m, axis=1, keepdims=True)
    nrm[nrm==0] = 1
    return m / nrm

embn = normalize(emb)

nlist = max(min(4096, int(np.ceil(np.sqrt(n)))), min(16384, n//64))  # autoNlistPairs
print('nlist =', nlist)

# flat quantizer: first nlist vectors by vec_id as seeds + 3 Lloyd rounds
# (cosine assignment, raw-mean update — trainQuantizer semantics)
cent = emb[:nlist].copy()
for it in range(3):
    cn = normalize(cent)
    t0 = time.time()
    asg = np.argmax(embn @ cn.T, axis=1)   # cosine argmax (ties ~ first idx, close enough for the lab)
    t1 = time.time()
    for l in range(nlist):
        m = asg == l
        if m.any(): cent[l] = emb[m].mean(axis=0)
    print(f'lloyd round {it}: assign {t1-t0:.1f}s')

cn = normalize(cent)
t0 = time.time()
S = embn @ cn.T                      # n x nlist cosines (the flat assignment cost)
flat_top4 = np.argsort(-S, axis=1)[:, :4]
t_flat = time.time() - t0
print(f'flat top-4 assignment: {t_flat:.1f}s')

# hierarchical: group the nlist fine centroids into ncoarse cells
ncoarse = max(16, int(np.ceil(np.sqrt(nlist))))
print('ncoarse =', ncoarse)
cc = cent[:ncoarse].copy()
for it in range(5):
    ccn = normalize(cc)
    ga = np.argmax(cn @ ccn.T, axis=1)   # fine centroid -> coarse group
    for g in range(ncoarse):
        m = ga == g
        if m.any(): cc[g] = cent[m].mean(axis=0)
ccn = normalize(cc)
ga = np.argmax(cn @ ccn.T, axis=1)
groups = [np.where(ga==g)[0] for g in range(ncoarse)]
sizes = np.array([len(g) for g in groups])
print('fine-per-coarse: mean %.1f max %d empty %d' % (sizes.mean(), sizes.max(), (sizes==0).sum()))

for w in (2, 4, 8):
    t0 = time.time()
    Sc = embn @ ccn.T                    # n x ncoarse
    topw = np.argsort(-Sc, axis=1)[:, :w]
    # fine scan within the selected cells only
    agree1 = 0; agree4 = 0; scanned = 0
    hier_top4 = np.empty((n,4), dtype=np.int64)
    B = 8192
    for s in range(0, n, B):
        e = min(s+B, n)
        for i in range(s, e):
            cand = np.concatenate([groups[g] for g in topw[i]])
            scanned += len(cand)
            sc = embn[i] @ cn[cand].T
            hier_top4[i] = cand[np.argsort(-sc)[:4]]
    t_h = time.time() - t0
    a1 = (hier_top4[:,0] == flat_top4[:,0]).mean()
    inter = np.array([len(np.intersect1d(hier_top4[i], flat_top4[i])) for i in range(n)])
    print(f'w={w}: argmax-agree {a1:.4f}  top4-overlap {inter.mean()/4:.4f}  '
          f'avg-fine-scanned {scanned/n:.0f} (vs {nlist} flat)  '
          f'flop-cut {(nlist)/(ncoarse + scanned/n):.1f}x  wall {t_h:.1f}s (numpy loopy, indicative only)')
