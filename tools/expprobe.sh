#!/bin/bash
AO="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
cd /root/repo
for F in 32 64; do
  echo "=== fresh JVM factor x$F ==="
  java -Xmx48g $AO -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "/tmp/bsclasses:/opt/spark/jars/*" graft.ExpProbe $F \
    q77_knn_join q90_ivf_knn q104_mutual_knn_clusters 2>/dev/null
done
