"""Prototype: integer fixed-point power iteration, Spark vs DuckDB.
Quantize embeddings to int (x*256 floor), mu = floor-mean, centered
ints; iterate: s_x = sum_d cx_d*v_d ; w_d = sum_x cx_d*s_x ;
v' = sign(w) * (|w|*1024 // max|w|).  All int64 ops — engine-exact.
"""
import duckdb
import numpy as np

rng = np.random.default_rng(7)
n, dim, iters = 500, 16, 6
X = rng.normal(size=(n, dim)) @ np.diag(np.linspace(3, 0.3, dim))

Xi = np.floor(X * 256).astype(np.int64)
mu = np.floor_divide(Xi.sum(axis=0), n)
C = Xi - mu

# python reference
v = np.zeros(dim, dtype=np.int64); v[0] = 1024
for _ in range(iters):
    s = C @ v
    w = C.T @ s
    m = np.abs(w).max()
    v = np.sign(w) * (np.abs(w) * 1024 // m)
py = v.copy()
print("py v:", py[:6], "max|w| fits int64" )

# duckdb chained-CTE version
con = duckdb.connect()
con.execute("CREATE TABLE emb AS SELECT * FROM (VALUES " +
    ",".join(f"({i},{d},{int(C[i,d])})" for i in range(n) for d in range(dim)) +
    ") t(vec_id, d, cx)")
cte = ["v0(d, val) AS (SELECT d, CASE WHEN d = 0 THEN 1024 ELSE 0 END FROM range(%d) t(d))" % dim]
for t in range(iters):
    cte.append(f"s{t} AS (SELECT e.vec_id, SUM(e.cx * v.val) AS s FROM emb e JOIN v{t} v ON e.d = v.d GROUP BY 1)")
    cte.append(f"w{t} AS (SELECT e.d, SUM(e.cx * s.s) AS w FROM emb e JOIN s{t} s ON e.vec_id = s.vec_id GROUP BY 1)")
    cte.append(f"m{t} AS (SELECT MAX(ABS(w)) AS m FROM w{t})")
    cte.append(f"v{t+1}(d, val) AS (SELECT d, CAST(SIGN(w) AS BIGINT) * ((ABS(w) * 1024) // (SELECT m FROM m{t})) FROM w{t})")
sql = "WITH " + ",\n".join(cte) + f"\nSELECT d, val FROM v{iters} ORDER BY d"
dk = con.execute(sql).fetchall()
dk = np.array([r[1] for r in dk], dtype=np.int64)
print("duckdb == python:", np.array_equal(dk, py))

# alignment with true float top component
from numpy.linalg import eigh
_, vecs = eigh((X - X.mean(0)).T @ (X - X.mean(0)))
top = vecs[:, -1]
cos = abs(np.dot(py, top) / (np.linalg.norm(py) * np.linalg.norm(top)))
print("cos(fixed, float-top):", round(float(cos), 6))
