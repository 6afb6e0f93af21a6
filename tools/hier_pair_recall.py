import pyarrow.dataset as ds
import numpy as np

d = ds.dataset('/tmp/graft_sfx10/embeddings.parquet')
t = d.to_table(columns=['vec_id','embedding'])
ids = np.array(t['vec_id']); emb = np.array(t['embedding'].to_pylist(), dtype=np.float32)
o = np.argsort(ids); ids, emb = ids[o], emb[o]
n, dim = emb.shape
def normalize(m):
    nr = np.linalg.norm(m, axis=1, keepdims=True); nr[nr==0]=1; return m/nr
embn = normalize(emb)
nlist = min(16384, n//64)

# flat quantizer (3 Lloyd as before)
cent = emb[:nlist].copy()
for it in range(3):
    cn = normalize(cent); asg = np.argmax(embn @ cn.T, axis=1)
    for l in range(nlist):
        m = asg==l
        if m.any(): cent[l] = emb[m].mean(axis=0)
cn = normalize(cent)

# coarse grouping of fine centroids
ncoarse = max(16, int(np.ceil(np.sqrt(nlist))))
cc = cent[:ncoarse].copy()
for it in range(5):
    ccn = normalize(cc); ga = np.argmax(cn @ ccn.T, axis=1)
    for g in range(ncoarse):
        m = ga==g
        if m.any(): cc[g] = cent[m].mean(axis=0)
ccn = normalize(cc); ga = np.argmax(cn @ ccn.T, axis=1)
groups = [np.where(ga==g)[0] for g in range(ncoarse)]

# truth: pairs with cos >= 0.35 among a 6000-vector slice (spans 3 replicas)
M = 6000
S = embn[:M] @ embn[:M].T
iu = np.triu_indices(M, 1)
mask = S[iu] >= 0.35
ta, tb = iu[0][mask], iu[1][mask]
print(f'true pairs (cos>=0.35) in first {M}: {len(ta)}')

S_fine = embn[:M] @ cn.T
flat4 = np.argsort(-S_fine, axis=1)[:, :4]
Sc = embn[:M] @ ccn.T
def hier_top4(w):
    topw = np.argsort(-Sc, axis=1)[:, :w]
    out = np.empty((M,4), dtype=np.int64)
    for i in range(M):
        cand = np.concatenate([groups[g] for g in topw[i]])
        sc = S_fine[i, cand]
        out[i] = cand[np.argsort(-sc)[:4]]
    return out

def pair_recall(assign4):
    sets = [set(r) for r in assign4]
    hit = sum(1 for a,b in zip(ta,tb) if sets[a] & sets[b])
    return hit/len(ta)

print(f'flat probes=4 pair recall {pair_recall(flat4):.4f}')
for w in (2,4,8):
    h4 = hier_top4(w)
    print(f'hier w={w} probes=4 pair recall {pair_recall(h4):.4f}')
