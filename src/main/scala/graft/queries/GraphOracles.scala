package graft.queries

/** DuckDB oracle SQL for the graph/cluster operators that have no direct
  * SQL builtin: connected components, closeness + Brandes betweenness,
  * and per-customer DBSCAN. All are exact reformulations, not
  * approximations:
  *
  *   - components: recursive-CTE reachability, component label = min
  *     vertex index over the reachable set (identical to GraphX
  *     `connectedComponents`, whose label is the min vertex id, with ids
  *     assigned by sorted-name zipWithIndex).
  *   - distances: bounded BFS as a recursive CTE (`min(d)` over all walks
  *     up to `maxD`); the customer-merchant bipartite graph has diameter 2
  *     at every test SF, so `maxD = 4` is a 2x safety margin.
  *   - betweenness: Brandes' sigma/delta recurrences unrolled per BFS
  *     layer as chained CTEs (aggregation is illegal inside a recursive
  *     term, but with bounded depth each layer is a plain GROUP BY join).
  *   - DBSCAN(min_samples=2): clusters are exactly the connected
  *     components of the eps-neighborhood graph, noise = isolated points,
  *     so the same reachability trick applies per customer.
  *
  * Float contract: sigma counts are integer-exact; delta/closeness mirror
  * the Scala arithmetic shape (same association order) so only
  * summation-order ulp noise remains, absorbed by the r6 rounding nudge.
  */
object GraphOracles {

  /** Shared symmetric edge list of the customer-merchant graph (reference
    * `advanced_features.py:27-50`), node-named like `GraphOps.symmetricEdges`.
    */
  private val graphCtes =
    """e0 AS (SELECT DISTINCT 'c:' || user_id AS src, 'm:' || event_type AS dst FROM events),
edges AS (SELECT src, dst FROM e0 UNION SELECT dst AS src, src AS dst FROM e0),
nodes AS (SELECT DISTINCT src AS node FROM edges)"""

  /** q49: connected-components parity with `GraphOps.communities`.
    * Component id = the smallest CUSTOMER id in the component — the
    * vid-scheme-independent label both engine paths (xxhash64 fast path,
    * dictionary fallback) emit; size counted over customers only.
    */
  val communitiesSql: String =
    s"""WITH RECURSIVE $graphCtes,
reach(src, node) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON e.src = r.node),
comp AS (
  SELECT r.src AS node,
    min(CASE WHEN r.node LIKE 'c:%' THEN CAST(substr(r.node, 3) AS BIGINT) END)
      AS component_id
  FROM reach r GROUP BY r.src),
cust AS (
  SELECT CAST(substr(node, 3) AS BIGINT) AS customer_id, component_id
  FROM comp WHERE node LIKE 'c:%'),
sizes AS (SELECT component_id, count(*) AS component_size FROM cust GROUP BY component_id)
SELECT c.customer_id, c.component_id, s.component_size
FROM cust c JOIN sizes s USING (component_id)"""

  /** q38: closeness (networkx wf_improved) + normalized Brandes
    * betweenness, unrolled to `maxD` BFS layers.
    */
  def centralitiesSql(maxD: Int = 3): String = {
    val sigLayers = (1 to maxD).map { d =>
      s"""sig$d AS MATERIALIZED (
  SELECT s.src, e.dst AS node, sum(s.sig) AS sig
  FROM sig${d - 1} s
  JOIN iedges e ON e.src = s.node
  JOIN dist dv ON dv.src = s.src AND dv.node = e.dst AND dv.d = $d
  GROUP BY s.src, e.dst)"""
    }.mkString(",\n")
    val delLayers = (maxD - 1 to 1 by -1).map { d =>
      s"""del$d AS MATERIALIZED (
  SELECT s.src, s.node, coalesce(c.val, 0.0) AS delta
  FROM sig$d s LEFT JOIN (
    SELECT s2.src, s2.node, sum(s2.sig::DOUBLE / sw.sig * (1.0 + dw.delta)) AS val
    FROM sig$d s2
    JOIN iedges e ON e.src = s2.node
    JOIN sig${d + 1} sw ON sw.src = s2.src AND sw.node = e.dst
    JOIN del${d + 1} dw ON dw.src = s2.src AND dw.node = e.dst
    GROUP BY s2.src, s2.node) c ON c.src = s.src AND c.node = s.node)"""
    }.mkString(",\n")
    val allDel = (1 to maxD).map(d => s"SELECT src, node, delta FROM del$d").mkString("\nUNION ALL\n")
    // walk/sigma/delta run on dense integer vids, not varchar node names —
    // the intermediate (src, node, d) sets reach |V|^2 rows and string keys
    // make DuckDB spill at the larger local SFs
    s"""WITH RECURSIVE $graphCtes,
idx AS (SELECT node, row_number() OVER (ORDER BY node) - 1 AS vid FROM nodes),
iedges AS MATERIALIZED (
  SELECT i1.vid AS src, i2.vid AS dst
  FROM edges e JOIN idx i1 ON i1.node = e.src JOIN idx i2 ON i2.node = e.dst),
inodes AS (SELECT vid FROM idx),
nn AS (SELECT count(*) AS n FROM inodes),
walk(src, node, d) AS (
  SELECT vid, vid, 0 FROM inodes
  UNION
  SELECT w.src, e.dst, w.d + 1 FROM walk w JOIN iedges e ON e.src = w.node WHERE w.d < $maxD),
dist AS MATERIALIZED (SELECT src, node, min(d) AS d FROM walk GROUP BY src, node),
clo0 AS MATERIALIZED (SELECT src, count(*) AS r, sum(d)::DOUBLE AS sumd FROM dist GROUP BY src),
closeness AS (
  SELECT src AS node,
    CASE WHEN r > 1 AND sumd > 0
      THEN ((r - 1)::DOUBLE / sumd) * ((r - 1)::DOUBLE / (n - 1)) ELSE 0.0 END AS clo
  FROM clo0 CROSS JOIN nn),
sig0 AS MATERIALIZED (SELECT vid AS src, vid AS node, CAST(1 AS BIGINT) AS sig FROM inodes),
$sigLayers,
del$maxD AS MATERIALIZED (SELECT src, node, 0.0 AS delta FROM sig$maxD),
$delLayers,
alldel AS (
$allDel),
btwraw AS (SELECT node, sum(delta) AS raw FROM alldel GROUP BY node),
btw AS (
  SELECT n2.vid AS node,
    coalesce(b.raw, 0.0) *
      (CASE WHEN n.n > 2 THEN 1.0 / ((n.n - 1)::BIGINT * (n.n - 2)) ELSE 0.0 END) AS btw
  FROM inodes n2 LEFT JOIN btwraw b ON b.node = n2.vid CROSS JOIN nn n)
SELECT CAST(substr(i.node, 3) AS BIGINT) AS customer_id,
  round(cl.clo + 5e-11, 4) AS graph_closeness_centrality,
  round(bt.btw + 5e-11, 4) AS graph_betweenness_centrality
FROM closeness cl JOIN btw bt ON bt.node = cl.node JOIN idx i ON i.vid = cl.node
WHERE i.node LIKE 'c:%'"""
  }

  /** q41: per-customer DBSCAN(eps=0.5, min_samples=2) over standardized
    * (amount, hour): clusters = components of the eps-graph, noise =
    * isolated points, (0.0, 1.0) defaults below 5 txns — sklearn parity
    * as pinned by ClusteringSpec.
    */
  val dbscanSql: String =
    """WITH RECURSIVE pts AS (
  SELECT user_id AS cust, event_id AS pid, value::DOUBLE AS amt, hour(ts)::DOUBLE AS hr
  FROM events),
m1 AS (SELECT cust, count(*) AS m, avg(amt) AS ma, avg(hr) AS mh FROM pts GROUP BY cust),
m2 AS (
  SELECT p.cust,
    avg((p.amt - ma) * (p.amt - ma)) AS va,
    avg((p.hr - mh) * (p.hr - mh)) AS vh
  FROM pts p JOIN m1 USING (cust) GROUP BY p.cust),
z AS (
  SELECT p.cust, p.pid,
    (p.amt - ma) / (CASE WHEN va = 0 THEN 1.0 ELSE sqrt(va) END) AS za,
    (p.hr - mh) / (CASE WHEN vh = 0 THEN 1.0 ELSE sqrt(vh) END) AS zh
  FROM pts p JOIN m1 USING (cust) JOIN m2 USING (cust)
  WHERE m1.m >= 5),
nbr AS (
  SELECT a.cust, a.pid AS i, b.pid AS j
  FROM z a JOIN z b ON a.cust = b.cust AND a.pid <> b.pid
  WHERE (a.za - b.za) * (a.za - b.za) + (a.zh - b.zh) * (a.zh - b.zh) <= 0.25),
core AS (SELECT DISTINCT cust, i AS pid FROM nbr),
reach(cust, src, node) AS (
  SELECT cust, pid, pid FROM core
  UNION
  SELECT r.cust, r.src, n.j FROM reach r JOIN nbr n ON n.cust = r.cust AND n.i = r.node),
comp AS (SELECT cust, src, min(node) AS comp FROM reach GROUP BY cust, src),
clusters AS (SELECT cust, count(DISTINCT comp) AS ncl FROM comp GROUP BY cust),
iso AS (
  SELECT z.cust, count(*) FILTER (WHERE c.pid IS NULL) AS noise, count(*) AS m
  FROM z LEFT JOIN core c ON c.cust = z.cust AND c.pid = z.pid
  GROUP BY z.cust)
SELECT s.cust AS customer_id,
  CASE WHEN s.m < 5 THEN 0.0
       ELSE round(i.noise::DOUBLE / i.m + 5e-11, 4) END AS behavioral_outlier_ratio,
  CASE WHEN s.m < 5 THEN 1.0 ELSE coalesce(cl.ncl, 0)::DOUBLE END AS behavioral_n_clusters
FROM m1 s
LEFT JOIN iso i ON i.cust = s.cust
LEFT JOIN clusters cl ON cl.cust = s.cust"""
}
